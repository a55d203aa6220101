package graft.ir

import java.sql.Timestamp

/**
 * Core row types of the engine (SURVEY.md §1.2). Index tables are plain
 * Parquet in this sandbox behind the same logical schemas an Iceberg
 * deployment would use (no Iceberg runtime jar offline — SURVEY.md §7.3).
 */

/** One turn of a multi-turn transcript — the only engine input
  * (BASELINE.json input_hint). One document == one conversation. */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp)

/** Assembled document: all turns of a conversation concatenated in
  * turn_idx order, with its deterministic dense docId. */
final case class Doc(doc_id: Long, conv_id: String, text: String)

/** Dictionary row. term_id is the deterministic dense rank of the term
  * under (df desc, term asc) ordering — frequent terms get small ids. */
final case class TermStat(
    term_id: Long,
    term: String,
    df: Long,
    cf: Long,
    idf: Double,       // log10(N/df)   — reference tf-idf scorer
    bm25_idf: Double)  // ln((N-df+0.5)/(df+0.5)+1)

/** Per-document statistics (reference max_freq_in_docs + derived norms,
  * plus BM25 doc length). */
final case class DocStat(
    doc_id: Long,
    conv_id: String,
    max_tf: Int,
    doc_len: Long,
    norm: Double) // sqrt(sum_t ((tf/max_tf)*idf)^2), 0 for empty docs

/** One compressed posting block: up to Codec.BlockSize (docId, tf) entries,
  * docIds strictly ascending, delta+varint encoded.
  *
  * Block metadata is deliberately free of corpus-global statistics (idf,
  * avgdl, N): every field depends only on the block's own documents, so
  * appending a new batch of documents (which shifts df/idf/avgdl for the
  * whole corpus) never invalidates an existing block — the IndexStore.append
  * path can leave old postings untouched at 10^12-turn scale. Scorer bounds
  * for WAND pruning are assembled at query time from this metadata plus the
  * CURRENT dictionary/meta stats:
  *   tf-idf:  idf(t) · block_max_ntf                       (exactly tight)
  *   BM25:    idf25(t) · s(max_tf, min_dl, avgdl_now)      (sound: s is
  *            increasing in tf and decreasing in dl) */
final case class Block(
    term_id: Long,
    first_doc_id: Long,     // skip-pointer lower bound
    last_doc_id: Long,      // skip-pointer upper bound
    count: Int,
    doc_ids: Array[Byte],   // delta+varint
    tfs: Array[Byte],       // varint
    max_tf: Int,            // max tf in block
    block_max_ntf: Double,  // max over block of tf/maxtf(d) — doc-local
    min_dl: Long)           // min over block of doc_len(d) — doc-local

/** Decoded posting entry. */
final case class Posting(term_id: Long, doc_id: Long, tf: Int)

/** Index-wide metadata (reference metadata.bin + BM25 needs). */
final case class IndexMeta(
    docs: Long,
    terms: Long,
    total_tokens: Long,
    avgdl: Double,
    postings: Long,
    blocks: Long)

/** Per-partition build lineage + metrics row (north rule: postings/sec,
  * bytes/partition, skew ratio recorded to a metrics table). */
final case class BuildMetric(
    stage: String,
    partition: String,
    rows: Long,
    bytes: Long,
    millis: Long,
    detail: String)

/** Search hit. */
final case class Hit(doc_id: Long, conv_id: String, score: Double)
