package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

import graft.ir.{Analyzer, AnalyzerConfig}

/**
 * Native Catalyst generator for the analyzer's tokenize-and-filter pass:
 * expands one text cell into its analyzed terms, like a fused
 * `explode(analyzeUdf(text))` without the UDF hop.
 *
 * The UDF form pays, per turn: UTF8String → java.lang.String decode, the
 * analyzer's String/StringBuilder churn, an Array[String] result, then a
 * Catalyst re-conversion building a GenericArrayData with a fresh
 * UTF8String ENCODE per token, then explode. This generator walks the
 * UTF8String's bytes directly on the ASCII fast path (NFKD is the identity,
 * lowering is +32, the weird-char set is non-ASCII — the same reasoning as
 * Analyzer.tokenizeAscii) and emits each surviving token as a byte-sliced
 * UTF8String; non-ASCII cells delegate to Analyzer.analyze verbatim, so
 * semantics are IDENTICAL to the UDF for every input (TokenizeTextSpec
 * fuzzes equality, including mixed-script lines).
 *
 * Only the stem-free, regex-free analyzer profiles route here
 * (IndexBuilder.tfStage guards); stem/regex configs keep the UDF path.
 */
case class TokenizeText(child: Expression, cfg: AnalyzerConfig)
    extends Expression with Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child)

  override def elementSchema: StructType = StructType(Seq(
    StructField("term", StringType, nullable = false)))

  @transient private lazy val stopBytes: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    cfg.stopwords.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  // ASCII chars the normalizer deletes (punctuation; weird chars are all
  // non-ASCII), indexed by the ALREADY-LOWERED byte exactly like
  // Analyzer.tokenizeAscii checks the lowered char
  @transient private lazy val asciiRemove: Array[Boolean] =
    Array.tabulate(128)(c => Analyzer.Punctuation.indexOf(c.toChar) >= 0)

  private def isSpace(b: Byte): Boolean =
    b == ' ' || (b >= '\t' && b <= '\r') // exactly Java regex \s on ASCII

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val text = v.asInstanceOf[UTF8String]
    val n = text.numBytes()
    val bytes = text.getBytes // copy only when not already array-exact
    var ascii = true
    var i = 0
    while (ascii && i < n) { if (bytes(i) < 0) ascii = false; i += 1 }
    if (!ascii) {
      // general path: identical by construction to the UDF form
      return Analyzer.analyze(text.toString, cfg).iterator
        .map(t => InternalRow(UTF8String.fromString(t)))
    }
    val minLen = cfg.minLen
    val maxLen = cfg.maxLen
    val stops = stopBytes
    val remove = asciiRemove
    new scala.collection.AbstractIterator[InternalRow] {
      private val buf = new Array[Byte](n + 1)
      private var pos = 0
      private var nextTok: UTF8String = _
      private def advance(): Unit = {
        while (nextTok == null && pos < n) {
          var len = 0
          var sawAny = false
          var p = pos
          var break = false
          while (!break && p < n) {
            val b0 = bytes(p)
            if (isSpace(b0)) {
              if (sawAny) break = true else p += 1
            } else {
              sawAny = true
              val b = if (b0 >= 'A' && b0 <= 'Z') (b0 + 32).toByte else b0
              if (!remove(b)) { buf(len) = b; len += 1 }
              p += 1
            }
          }
          pos = p
          if (sawAny && len > 0) {
            val t = UTF8String.fromBytes(buf, 0, len)
            // reference order: stopword filter, then length filter
            if (!stops.contains(t) && len >= minLen && len <= maxLen)
              nextTok = t.clone() // own bytes — buf is reused per token
          }
        }
      }
      override def hasNext: Boolean = { advance(); nextTok != null }
      override def next(): InternalRow = {
        advance()
        val r = InternalRow(nextTok)
        nextTok = null
        r
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object TokenizeText {
  /** Generator column over a text column for a stem-free, regex-free
    * analyzer profile. */
  def column(text: Column, cfg: AnalyzerConfig): Column = {
    require(cfg.stem.isEmpty && !cfg.regex,
      "TokenizeText fast path covers stem-free, regex-free profiles only")
    GraftBridge.column(TokenizeText(GraftBridge.expression(text), cfg))
  }
}
