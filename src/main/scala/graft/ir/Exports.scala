package graft.ir

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Index export / derived-view operators:
 *
 *  - S6 sequential text postings format: the reference keeps a debug-readable
 *    dump `term:doc,freq;doc,freq;…` (`modulos/Postings.py:115-199`). Here a
 *    DataFrame of the same strings (write as text/json/csv as needed).
 *
 *  - A6 materialized tf-idf doc weights: the reference GPU path precomputes
 *    `w(t,d) = (tf/maxtf_d)·idf_t` at load time
 *    (`ir_collection_handler.c:229-256`); the engine stores tf and computes
 *    weights at query time (scorer-agnostic index), but exposes the
 *    materialized weights table for consumers that want the reference's
 *    layout.
 */
object Exports {

  /** Decoded postings with term ids: (term_id, doc_id, tf) — native
    * generator decode (graft.functions.DecodeBlock). */
  def decodedPostings(view: IndexView): DataFrame =
    graft.functions.DecodeBlock.postings(view.postings.toDF())

  /** A6: (term_id, doc_id, tf, weight) with the reference tf-idf doc weight. */
  def weightsTable(view: IndexView): DataFrame =
    decodedPostings(view)
      .join(view.termDict.select("term_id", "idf"), "term_id")
      .join(view.docStats.select("doc_id", "max_tf"), "doc_id")
      .withColumn("weight",
        when(col("max_tf") === 0, 0.0)
          .otherwise(col("tf") / col("max_tf") * col("idf")))
      .select("term_id", "doc_id", "tf", "weight")

  /** S6 inverse: parse `term:doc,freq;…` lines back into (term, doc_id, tf)
    * rows — the reference reads its text postings format back too
    * (`GPU_server/ir_collection.c:116-166`). Accepts any DataFrame with a
    * string `line` column (e.g. spark.read.text output).
    *
    * Separator disambiguation (ADVICE r2): a verbatim-indexed term may
    * itself contain `:`/`,`/`;` (a date, a time). The postings tail is
    * strictly `[0-9,;]*`, so the separator colon is found by scanning
    * BACKWARD past that maximal digit/`,`/`;` suffix — everything before it
    * is the term, whatever characters it holds. Malformed lines fail loudly. */
  def parseSequentialDump(lines: DataFrame): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._
    lines.select(col("line")).as[String].flatMap { l =>
      var i = l.length - 1
      while (i >= 0 && { val c = l.charAt(i); (c >= '0' && c <= '9') || c == ',' || c == ';' }) i -= 1
      require(i >= 0 && l.charAt(i) == ':', s"malformed postings line: $l")
      val term = l.substring(0, i)
      l.substring(i + 1).split(";").iterator.filter(_.nonEmpty).map { p =>
        val j = p.indexOf(',')
        (term, p.substring(0, j).toLong, p.substring(j + 1).toInt)
      }
    }.toDF("term", "doc_id", "tf")
  }

  /** S6: `term:doc,freq;doc,freq;…` lines, docId-ascending per term. */
  def sequentialDump(view: IndexView): DataFrame =
    decodedPostings(view)
      .join(view.termDict.select("term_id", "term"), "term_id")
      .groupBy("term")
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("doc_id"), col("tf")))),
          p => concat_ws(",", p.getField("doc_id"), p.getField("tf"))),
        ";").as("postings"))
      .select(concat(col("term"), lit(":"), col("postings")).as("line"))
}
