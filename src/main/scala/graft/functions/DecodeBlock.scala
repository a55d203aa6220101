package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.ir.Codec

/**
 * Native Catalyst generator for posting-block decode: expands one block row
 * (delta+varint `doc_ids`, varint `tfs`, `count`) into `count` (doc_id, tf)
 * rows, like a typed `posexplode` over the codec.
 *
 * This replaces the query path's `Dataset[Block].flatMap`, whose physical
 * plan is DeserializeToObject → MapPartitions → SerializeFromObject: every
 * block pays a Tungsten→JVM object conversion (copying both byte arrays
 * into a `Block` case class) and every posting a Tuple3 allocation plus
 * re-serialization. The generator reads the two byte arrays straight out of
 * the columnar row and emits InternalRows — postings never leave Tungsten
 * format. The reference's analog is the raw `memcpy` walk of its packed
 * posting files (`GPU_server/ir_collection.c:116-166`), re-expressed as the
 * engine-native expression kind Spark uses for explode.
 */
case class DecodeBlock(docIds: Expression, tfs: Expression, count: Expression)
    extends Expression with Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(docIds, tfs, count)

  override def elementSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("tf", IntegerType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val db = docIds.eval(input)
    val tb = tfs.eval(input)
    val cnt = count.eval(input)
    if (db == null || tb == null || cnt == null) Iterator.empty
    else {
      val n = cnt.asInstanceOf[Int]
      val ids = Codec.decodeDocIds(db.asInstanceOf[Array[Byte]], n)
      val fs = Codec.decodeTfs(tb.asInstanceOf[Array[Byte]], n)
      new scala.collection.AbstractIterator[InternalRow] {
        private var i = 0
        override def hasNext: Boolean = i < n
        override def next(): InternalRow = {
          val r = InternalRow(ids(i), fs(i))
          i += 1
          r
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(docIds = newChildren(0), tfs = newChildren(1), count = newChildren(2))
}

object DecodeBlock {

  /** Generator column over the standard Block columns. */
  def column(docIds: Column, tfs: Column, count: Column): Column =
    GraftBridge.column(DecodeBlock(
      GraftBridge.expression(docIds),
      GraftBridge.expression(tfs),
      GraftBridge.expression(count)))

  /** Decode a Block-shaped DataFrame to (term_id, doc_id, tf) rows. */
  def postings(blocks: DataFrame): DataFrame =
    blocks.select(col("term_id"),
      column(col("doc_ids"), col("tfs"), col("count")))
}
