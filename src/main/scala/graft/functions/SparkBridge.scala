package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Catalyst-Expression bridge. Spark 4 moved these conversions
  * behind `private[sql]` (`classic.ExpressionUtils`); libraries shipping
  * native expressions (as graft does for posting-block decode) expose them
  * through a package-located shim — the standard extension-library
  * technique. No Spark internals are modified. */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The compiled physical RDD of a DataFrame (`queryExecution.toRdd`).
    * Running several jobs against this ONE RDD instance reuses its shuffle
    * map stages across jobs — the property IndexBuilder.zipWithDenseId needs
    * for its count-then-assign prefix sum to scan upstream lineage once. */
  def toInternalRdd(df: Dataset[_]): org.apache.spark.rdd.RDD[catalyst.InternalRow] =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.toRdd

  /** Wrap an InternalRow RDD as a DataFrame without the external-Row
    * round-trip `createDataFrame(rdd, schema)` pays (per-row converters in
    * BOTH directions — the r3 verdict's "non-codegen RDD hop"). */
  def internalCreateDataFrame(
      spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[catalyst.InternalRow],
      schema: types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(rdd, schema)
}
