package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ir._
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query names reference the SURVEY.md §2 operator inventory (a1=per-doc tf,
  * a2=vocabulary, …, j1=scoring join, j4=intersection, t4=top-k terms) plus
  * the training-data operators (dd=dedup, sim=similarity, tx=text analysis,
  * mm=multimodal). Every SQL-expressible operator has a DuckDB oracle; block
  * codec/WAND/LSH internals are covered by ScalaTest rank-identity and
  * property suites instead (SURVEY.md §5.3).
  */
object SparkEntry {

  /** Cross-engine-stable 6-decimal quantization (see TextAnalysis.quantize6):
    * used for RATIONAL-valued scores (jaccard, ratios, df means, float dot
    * products), which can land exactly on .5 micro-unit boundaries where
    * Spark's and DuckDB's round(x, 6) half-way semantics disagree.
    * Log/sqrt-derived scores (idf, norms, BM25) keep plain round. */
  private def q6(c: org.apache.spark.sql.Column) = floor(c * 1e6 + 0.5) / 1e6
  private def q6sql(e: String) = s"floor(($e) * 1e6 + 0.5) / 1e6"

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Pipelines.searchOrig(spark, "/root/testdata/sf0.001",
      Pipelines.FixedQuery, 10, Or, Bm25)

  private val Q = Seq("data", "query", "fast", "table", "window")
  private def qIn = Q.map(t => s"'$t'").mkString("(", ", ", ")")

  /** Batch-serving query set (j1_batch_topk): overlapping term sets so the
    * shared decode is exercised; one term repeated so query-tf > 1 is too. */
  private val BatchQ: Seq[(String, String)] = Seq(
    "q1" -> "data query fast table window",
    "q2" -> "data fast data",
    "q3" -> "window table query")

  /** (qid, term, qtf) VALUES rows mirroring the analyzer's query-side tf. */
  private def batchValues: String = BatchQ.flatMap { case (qid, text) =>
    text.split(" ").groupBy(identity).toSeq.sortBy(_._1)
      .map { case (t, g) => s"('$qid', '$t', ${g.length})" }
  }.mkString(", ")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- IR index build operators (through the real index tables) ----
    "a1_tf" -> ((s, dir) =>
      Pipelines.decodedTf(s, dir)
        .select(col("doc_id"), col("term"), col("tf").cast("long").as("tf"))
        .orderBy("doc_id", "term")),

    "a2_term_dict" -> ((s, dir) =>
      Pipelines.index(s, dir).termDict.toDF()
        .select(col("term_id"), col("term"), col("df"), col("cf"))
        .orderBy("term_id")),

    "a5_idf" -> ((s, dir) =>
      Pipelines.index(s, dir).termDict.toDF()
        .select(col("term"), round(col("idf"), 6).as("idf"),
          round(col("bm25_idf"), 6).as("bm25_idf"))
        .orderBy("term")),

    "a3a7_doc_stats" -> ((s, dir) =>
      Pipelines.docStatsOrig(s, dir)
        .select(col("doc_id_orig").as("doc_id"),
          col("max_tf").cast("long").as("max_tf"),
          col("doc_len"), round(col("norm"), 6).as("norm"))
        .orderBy("doc_id")),

    "a6_weights" -> ((s, dir) => {
      val v = Pipelines.index(s, dir)
      Exports.weightsTable(v)
        .join(v.termDict.toDF().select("term_id", "term"), "term_id")
        .join(v.docMap.select(col("doc_id"),
          substring(col("conv_id"), 2, 18).cast("long").as("doc_id_orig")), "doc_id")
        .select(col("doc_id_orig").as("doc_id"), col("term"),
          col("tf").cast("long").as("tf"), round(col("weight"), 6).as("weight"))
        .orderBy("doc_id", "term")
    }),

    "s6_postings_dump" -> ((s, dir) => // oracled: string_agg reconstruction
      Exports.sequentialDump(Pipelines.index(s, dir)).orderBy("line")),

    "a8_corpus_stats" -> ((s, dir) => {
      import s.implicits._
      val v = Pipelines.index(s, dir)
      val hapax = v.termDict.filter(col("cf") === 1).count()
      Seq((v.meta.docs, v.meta.terms, v.meta.postings, v.meta.total_tokens,
        math.floor(v.meta.avgdl * 1e6 + 0.5) / 1e6, hapax))
        .toDF("docs", "terms", "postings", "total_tokens", "avgdl", "hapax")
    }),

    "a9_posting_stats" -> ((s, dir) =>
      Pipelines.index(s, dir).termDict.toDF().agg(
        min("df").as("min_df"), max("df").as("max_df"),
        q6(avg("df")).as("mean_df"),
        q6(max("df").cast("double") / avg("df")).as("skew"))),

    "t4_topk_terms" -> ((s, dir) =>
      Pipelines.index(s, dir).termDict.toDF()
        .select(col("term"), col("cf"))
        .orderBy(col("cf").desc, col("term").asc).limit(20)),

    // ---- query serving (J1/J2/T1-T3 + BM25 + AND/J4 + WAND) ----
    "j1_cosine_topk" -> ((s, dir) =>
      Pipelines.searchOrig(s, dir, Pipelines.FixedQuery, 10, Or, TfIdfCosine)),

    "j1_bm25_topk" -> ((s, dir) =>
      Pipelines.searchOrig(s, dir, Pipelines.FixedQuery, 10, Or, Bm25)),

    "j4_and_docs" -> ((s, dir) =>
      Pipelines.searchOrig(s, dir, Pipelines.FixedQuery, 1000000, And, Bm25)
        .select("doc_id").orderBy("doc_id")),

    "wand_topk" -> ((s, dir) => // oracled: == exact BM25 (sound pruning)
      Pipelines.searchWand(s, dir, Pipelines.FixedQuery, 10)),

    "j1_batch_topk" -> ((s, dir) => // one job scores all three queries
      Pipelines.searchBatchOrig(s, dir, BatchQ, 10)),

    // ---- X21 tombstone deletes, end-to-end (build→dedup→delete→search) ----
    "x21_delete_search" -> ((s, dir) =>
      Pipelines.searchDeleted(s, dir, Pipelines.FixedQuery, 10)),

    // ---- dedup ----
    "dd_exact" -> ((s, dir) =>
      Dedup.exact(Pipelines.documents(s, dir)).orderBy("h")),

    "dd_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccard(Pipelines.documents(s, dir), 0.5)
        .select(col("doc_a"), col("doc_b"), q6(col("jaccard")).as("jaccard"))
        .orderBy("doc_a", "doc_b")),

    "dd_minhash_lsh" -> ((s, dir) => // oracled: == exact jaccard set at 0.5
      Dedup.minhashLsh(Pipelines.documents(s, dir), 0.5)
        .select(col("doc_a"), col("doc_b"), q6(col("jaccard")).as("jaccard"))
        .orderBy("doc_a", "doc_b")),

    "dd_simhash" -> ((s, dir) => // oracled: SQL-replicated FNV-1a64 simhash
      Dedup.simhash(Pipelines.documents(s, dir), 3)
        .orderBy("doc_a", "doc_b")),

    "dd_embedding" -> ((s, dir) =>
      Dedup.embeddingNearDup(Pipelines.embeddings(s, dir), 0.4)
        .select(col("doc_a"), col("doc_b"), q6(col("cosine")).as("cosine"))
        .orderBy("doc_a", "doc_b")),

    // ---- similarity search ----
    "sim_ann_brute" -> ((s, dir) => {
      val q = Pipelines.embeddings(s, dir).filter(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0).toArray
      Similarity.annBrute(Pipelines.embeddings(s, dir), q, 0L, 10)
        .select(col("vec_id"), q6(col("cosine")).as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id").asc)
    }),

    "sim_ann_lsh" -> ((s, dir) => { // rows-only: recall vs brute is spec-tested
      val q = Pipelines.embeddings(s, dir).filter(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0).toArray
      // serving shape: the signature index is built once per corpus
      // (Pipelines memo) and each query is a pruned probe
      Pipelines.annIndex(s, dir).query(q, 0L, 10)
        .select(col("vec_id"), q6(col("cosine")).as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id").asc)
    }),

    "sim_ann_ivf" -> ((s, dir) => { // rows-only: recall vs brute is spec-tested
      val q = Pipelines.embeddings(s, dir).filter(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0).toArray
      Pipelines.ivfIndex(s, dir).query(q, 0L, 10, nprobe = 2)
        .select(col("vec_id"), q6(col("cosine")).as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id").asc)
    }),

    // ---- text analysis ----
    "tx_lang_id" -> ((s, dir) =>
      TextAnalysis.langId(Pipelines.documents(s, dir)).orderBy("doc_id")),

    "tx_token_counts" -> ((s, dir) =>
      TextAnalysis.tokenCounts(Pipelines.documents(s, dir)).orderBy("doc_id")),

    "tx_quality" -> ((s, dir) =>
      TextAnalysis.qualityScore(Pipelines.documents(s, dir)).orderBy("doc_id")),

    "tx_fingerprint" -> ((s, dir) => // rows-only: golden values spec-tested
      TextAnalysis.fingerprint(Pipelines.documents(s, dir)).orderBy("doc_id")),

    // ---- multimodal plumbing (stubbed codec, real schema/batching) ----
    "mm_features" -> ((s, dir) => // oracled: histogram mass conservation
      Multimodal.extractFeatures(Multimodal.mediaFromDocs(Pipelines.documents(s, dir)))
        .select(col("media_id"), col("n_bytes"),
          round(aggregate(col("features"), lit(0.0d),
            (a, x) => a + x.cast("double")), 4).as("feature_mass"))
        .orderBy("media_id")),

    "mm_frames" -> ((s, dir) => // oracled: frame boundaries are arithmetic
      Multimodal.sampleFrames(Multimodal.mediaFromDocs(Pipelines.documents(s, dir)))
        .select(col("media_id"), col("frame_idx"),
          length(col("frame")).cast("long").as("frame_len"))
        .orderBy("media_id", "frame_idx"))
  )

  /** Shared DuckDB CTE prelude: the analyzer profile (split + length [3,23])
    * and the tf/dict/doc-stat derivations, mirroring Analyzer.Plain. */
  private val P =
    """WITH tok AS (
      |  SELECT doc_id, t FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
      |  WHERE length(t) BETWEEN 3 AND 23),
      |tf AS (SELECT doc_id, t AS term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
      |dict AS (SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf FROM tf GROUP BY 1),
      |nn AS (SELECT count(*)::DOUBLE AS n FROM documents),
      |stats AS (SELECT doc_id, max(tf)::BIGINT AS max_tf, sum(tf)::BIGINT AS doc_len FROM tf GROUP BY 1),
      |norms AS (SELECT t.doc_id, sqrt(sum(pow(t.tf * log10(nn.n/d.df), 2))) AS sq
      |          FROM tf t JOIN dict d USING (term), nn GROUP BY t.doc_id)
      |""".stripMargin

  private val enList = Analyzer.EnglishStopwords.toSeq.sorted
    .map(w => s"'$w'").mkString("(", ", ", ")")

  private def langRatio(lang: String): String = {
    val words = TextAnalysis.LangWords(lang).map(w => s"'$w'").mkString("(", ", ", ")")
    s"floor(len(list_filter(string_split(text, ' '), x -> x IN $words))::DOUBLE" +
      s" / greatest(len(string_split(text, ' ')), 1) * 1e6 + 0.5) / 1e6"
  }

  private lazy val bm25TopkSql = P + s""",
    |avgdl AS (SELECT avg(doc_len) AS a FROM stats),
    |b25 AS (SELECT t.doc_id,
    |  sum(ln((nn.n - d.df + 0.5) / (d.df + 0.5) + 1.0) * (t.tf * 2.2)
    |      / (t.tf + 1.2 * (0.25 + 0.75 * s.doc_len / avgdl.a))) AS score
    |  FROM tf t JOIN dict d USING (term) JOIN stats s USING (doc_id), nn, avgdl
    |  WHERE t.term IN $qIn GROUP BY 1)
    |SELECT doc_id, round(score, 6) AS score FROM b25 WHERE score > 0
    |ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin

  def oracleSql: Map[String, String] =
    staticOracles ++
      lshOracle.map("sim_ann_lsh" -> _) ++
      ivfOracle.map("sim_ann_ivf" -> _)

  private def staticOracles: Map[String, String] = Map(
    "a1_tf" -> (P +
      "SELECT doc_id, term, tf FROM tf ORDER BY doc_id, term"),

    "a2_term_dict" -> (P +
      """SELECT row_number() OVER (ORDER BY df DESC, term ASC) - 1 AS term_id,
        |term, df, cf FROM dict ORDER BY term_id""".stripMargin),

    "a5_idf" -> (P +
      """SELECT term, round(log10(nn.n / df), 6) AS idf,
        |round(ln((nn.n - df + 0.5) / (df + 0.5) + 1.0), 6) AS bm25_idf
        |FROM dict, nn ORDER BY term""".stripMargin),

    "a3a7_doc_stats" -> (P +
      """SELECT s.doc_id, s.max_tf, s.doc_len, round(norms.sq / s.max_tf, 6) AS norm
        |FROM stats s JOIN norms USING (doc_id) ORDER BY doc_id""".stripMargin),

    "a6_weights" -> (P +
      """SELECT t.doc_id, t.term, t.tf,
        |round(t.tf::DOUBLE / s.max_tf * log10(nn.n / d.df), 6) AS weight
        |FROM tf t JOIN stats s USING (doc_id) JOIN dict d USING (term), nn
        |ORDER BY doc_id, term""".stripMargin),

    "a8_corpus_stats" -> (P +
      """SELECT (SELECT count(*) FROM documents)::BIGINT AS docs,
        |(SELECT count(*) FROM dict)::BIGINT AS terms,
        |(SELECT count(*) FROM tf)::BIGINT AS postings,
        |(SELECT sum(tf) FROM tf)::BIGINT AS total_tokens,
        |(SELECT floor(avg(doc_len) * 1e6 + 0.5) / 1e6 FROM stats) AS avgdl,
        |(SELECT count(*) FROM dict WHERE cf = 1)::BIGINT AS hapax""".stripMargin),

    "a9_posting_stats" -> (P +
      ("""SELECT min(df) AS min_df, max(df) AS max_df, """ +
        s"${q6sql("avg(df)")} AS mean_df, " +
        s"${q6sql("max(df) / avg(df)")} AS skew FROM dict")),

    "t4_topk_terms" -> (P +
      "SELECT term, cf FROM dict ORDER BY cf DESC, term ASC LIMIT 20"),

    "j1_cosine_topk" -> (P + s""",
      |qw AS (SELECT term, log10(nn.n/df) AS w FROM dict, nn WHERE term IN $qIn),
      |qn AS (SELECT sqrt(sum(w*w)) AS qn FROM qw),
      |num AS (SELECT t.doc_id, sum(q.w * q.w * t.tf) AS raw
      |        FROM tf t JOIN qw q USING (term) GROUP BY 1)
      |SELECT s.doc_id,
      |  round(num.raw / s.max_tf / (qn.qn * (norms.sq / s.max_tf)), 6) AS score
      |FROM num JOIN stats s USING (doc_id) JOIN norms USING (doc_id), qn
      |WHERE num.raw > 0
      |ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin),

    "j1_bm25_topk" -> bm25TopkSql,

    // WAND is pruning-only (sound bounds): its top-k equals exact BM25, so
    // it shares the same DuckDB oracle (plus WandFuzzSpec equality fuzzing)
    "wand_topk" -> bm25TopkSql,

    // tombstone semantics: deleted docs vanish from results immediately,
    // while df/idf/avgdl stay as BUILT until compact — so the oracle scores
    // with FULL-corpus statistics and restricts the ranking to survivors
    // (exact-dedup keepers minus the doc_id % 7 == 3 slice, mirroring
    // Pipelines.deletedIndex's victim set)
    "x21_delete_search" -> (P + s""",
      |avgdl AS (SELECT avg(doc_len) AS a FROM stats),
      |b25 AS (SELECT t.doc_id,
      |  sum(ln((nn.n - d.df + 0.5) / (d.df + 0.5) + 1.0) * (t.tf * 2.2)
      |      / (t.tf + 1.2 * (0.25 + 0.75 * s.doc_len / avgdl.a))) AS score
      |  FROM tf t JOIN dict d USING (term) JOIN stats s USING (doc_id), nn, avgdl
      |  WHERE t.term IN $qIn GROUP BY 1),
      |surv AS (SELECT doc_id FROM (
      |    SELECT d.doc_id, min(d.doc_id) OVER (PARTITION BY md5(d.text)) AS keeper
      |    FROM documents d)
      |  WHERE doc_id = keeper AND doc_id % 7 <> 3)
      |SELECT doc_id, round(score, 6) AS score FROM b25 JOIN surv USING (doc_id)
      |WHERE score > 0 ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin),

    "j1_batch_topk" -> (P + s""",
      |avgdl AS (SELECT avg(doc_len) AS a FROM stats),
      |qt AS (SELECT * FROM (VALUES $batchValues) AS v(qid, qterm, qtf)),
      |b25 AS (SELECT qt.qid, t.doc_id,
      |  sum(qt.qtf * ln((nn.n - d.df + 0.5) / (d.df + 0.5) + 1.0) * (t.tf * 2.2)
      |      / (t.tf + 1.2 * (0.25 + 0.75 * s.doc_len / avgdl.a))) AS score
      |  FROM tf t JOIN qt ON t.term = qt.qterm
      |  JOIN dict d USING (term) JOIN stats s USING (doc_id), nn, avgdl
      |  GROUP BY 1, 2),
      |rk AS (SELECT qid, doc_id, score,
      |  row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id ASC) AS rnk
      |  FROM b25 WHERE score > 0)
      |SELECT qid AS query_id, doc_id, round(score, 6) AS score, rnk AS "rank"
      |FROM rk WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin),

    "j4_and_docs" -> (P + s"""
      |SELECT doc_id FROM tf WHERE term IN $qIn
      |GROUP BY doc_id HAVING count(*) = ${Q.length} ORDER BY doc_id""".stripMargin),

    // the engine's dump keys lines by the internal dense doc_id (rank of
    // conv_id = zero-padded original id, so rank of doc_id); `term:d,f;d,f;…`
    // docId-ascending per term (modulos/Postings.py:115-199)
    "s6_postings_dump" -> (P + """,
      |ids AS (SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS did
      |        FROM documents)
      |SELECT term || ':' ||
      |  string_agg(did::VARCHAR || ',' || tf::VARCHAR, ';' ORDER BY did) AS line
      |FROM tf JOIN ids USING (doc_id) GROUP BY term ORDER BY line""".stripMargin),

    "dd_exact" ->
      """SELECT md5(text) AS h, count(*)::BIGINT AS n_dups, min(doc_id) AS keeper
        |FROM documents GROUP BY 1 ORDER BY h""".stripMargin,

    // minhash+LSH shares the exact-jaccard oracle: candidate verification
    // makes precision exact, and OpsSpec proves full recall at 0.5 on this
    // banding (32 bands of 2 → P(miss | j ≥ 0.5) ≤ 0.75^32 ≈ 1e-4)
    "dd_minhash_lsh" ->
      """WITH base AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |tok0 AS (SELECT doc_id, unnest(toks) AS t, generate_subscripts(toks, 1) AS i FROM base),
        |ftok AS (SELECT doc_id, t, i FROM tok0 WHERE length(t) BETWEEN 3 AND 23),
        |sh0 AS (SELECT doc_id, t || ' ' || lead(t, 1) OVER w || ' ' || lead(t, 2) OVER w AS s
        |        FROM ftok WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
        |sh AS (SELECT DISTINCT doc_id, s FROM sh0 WHERE s IS NOT NULL),
        |sz AS (SELECT doc_id, count(*)::BIGINT AS sz FROM sh GROUP BY 1),
        |inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*)::BIGINT AS i
        |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT da AS doc_a, db AS doc_b,
        |  floor((i::DOUBLE / (sa.sz + sb.sz - i)) * 1e6 + 0.5) / 1e6 AS jaccard
        |FROM inter JOIN sz sa ON sa.doc_id = da JOIN sz sb ON sb.doc_id = db
        |WHERE i::DOUBLE / (sa.sz + sb.sz - i) >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin,

    "dd_ngram_jaccard" ->
      """WITH base AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |tok0 AS (SELECT doc_id, unnest(toks) AS t, generate_subscripts(toks, 1) AS i FROM base),
        |ftok AS (SELECT doc_id, t, i FROM tok0 WHERE length(t) BETWEEN 3 AND 23),
        |sh0 AS (SELECT doc_id, t || ' ' || lead(t, 1) OVER w || ' ' || lead(t, 2) OVER w AS s
        |        FROM ftok WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
        |sh AS (SELECT DISTINCT doc_id, s FROM sh0 WHERE s IS NOT NULL),
        |sz AS (SELECT doc_id, count(*)::BIGINT AS sz FROM sh GROUP BY 1),
        |inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*)::BIGINT AS i
        |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT da AS doc_a, db AS doc_b,
        |  floor((i::DOUBLE / (sa.sz + sb.sz - i)) * 1e6 + 0.5) / 1e6 AS jaccard
        |FROM inter JOIN sz sa ON sa.doc_id = da JOIN sz sb ON sb.doc_id = db
        |WHERE i::DOUBLE / (sa.sz + sb.sz - i) >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin,

    // full FNV-1a64 + simhash in SQL (closes the r2 no_oracle): HUGEINT
    // carries the 64-bit state (the ×0x100000001B3 step needs 104 bits);
    // the per-byte XOR touches only the low byte, so it runs in BIGINT;
    // bit extraction happens after a two's-complement cast (>> then &1 is
    // sign-safe). The recursive CTE iterates over token characters — ASCII
    // corpus, so unicode(char) == the char code fnv1a64 hashes. The engine's
    // banded-LSH candidates equal these O(n²) pairs exactly because 4×16-bit
    // banding is lossless at hamming ≤ 3 (pigeonhole). Token-less docs
    // (none in testdata) would carry simhash 0 engine-side but no row here.
    "dd_simhash" ->
      """WITH RECURSIVE
        |tok AS (SELECT doc_id, t FROM
        |  (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
        |  WHERE length(t) BETWEEN 3 AND 23),
        |w AS (SELECT doc_id, t, count(*)::BIGINT AS w FROM tok GROUP BY 1, 2),
        |toks AS (SELECT DISTINCT t FROM w),
        |f(t, i, h) AS (
        |  SELECT t, 0, 14695981039346656037::HUGEINT FROM toks
        |  UNION ALL
        |  SELECT t, i + 1,
        |    ((h - (h % 256) + xor((h % 256)::BIGINT, unicode(substr(t, i + 1, 1)))::HUGEINT)
        |      * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT
        |  FROM f WHERE i < length(t)),
        |fnv AS (
        |  SELECT t, CASE WHEN h >= 9223372036854775808::HUGEINT
        |    THEN (h - 18446744073709551616::HUGEINT) ELSE h END::BIGINT AS hs
        |  FROM f WHERE i = length(t)),
        |bits AS (
        |  SELECT w.doc_id, b.i AS bit,
        |    sum(CASE WHEN ((fnv.hs >> b.i) & 1) = 1 THEN w.w ELSE -w.w END) AS acc
        |  FROM w JOIN fnv USING (t) CROSS JOIN range(64) b(i)
        |  GROUP BY 1, 2),
        |sh AS (
        |  SELECT doc_id,
        |    sum(CASE WHEN acc > 0 THEN
        |      (CASE WHEN bit = 63 THEN -9223372036854775808 ELSE (1::BIGINT << bit) END)
        |      ELSE 0 END)::BIGINT AS sim
        |  FROM bits GROUP BY 1)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  bit_count(xor(a.sim, b.sim)) AS hamming
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sim, b.sim)) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin,

    "dd_embedding" ->
      """SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
        |  floor(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) * 1e6 + 0.5) / 1e6 AS cosine
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4
        |ORDER BY doc_a, doc_b""".stripMargin,

    "sim_ann_brute" ->
      """WITH q AS (SELECT embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id = 0),
        |qn AS (SELECT sqrt(list_dot_product(e, e)) AS n FROM q)
        |SELECT vec_id,
        |  floor(list_dot_product(embedding::DOUBLE[], q.e) / qn.n * 1e6 + 0.5) / 1e6 AS cosine
        |FROM embeddings, q, qn WHERE vec_id <> 0
        |ORDER BY cosine DESC, vec_id ASC LIMIT 10""".stripMargin,

    "tx_lang_id" -> {
      val langs = TextAnalysis.LangWords.keys.toSeq.sorted
      val rs = langs.map(l => s"${langRatio(l)} AS r_$l").mkString(", ")
      val unions = langs.map(l =>
        s"SELECT doc_id, '$l' AS lang, r_$l AS r FROM scored").mkString(" UNION ALL ")
      s"""WITH scored AS (SELECT doc_id, $rs FROM documents),
        |sc AS ($unions),
        |rk AS (SELECT doc_id, lang, r,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY r DESC, lang ASC) AS rn FROM sc)
        |SELECT doc_id, lang AS lang_pred, r AS ratio FROM rk WHERE rn = 1
        |ORDER BY doc_id""".stripMargin
    },

    // full 31-base mod-(2^61-1) rolling fingerprint in SQL (closes the r3
    // no_oracle): HUGEINT carries the modular state; per-token hashes come
    // from a char-recursion over the DISTINCT vocabulary (tiny), and the
    // doc-level fold is linearized — fp = Σ_i F(tok_i ++ ' ')·31^{suffix_i}
    // mod M, with the 31-powers from a single recursive chain (fold(h, s) =
    // h·31^{len s} + F(s) mod M, applied right-to-left). Token-less docs
    // carry fingerprint 0 (left join + coalesce), as the engine does.
    "tx_fingerprint" ->
      """WITH RECURSIVE
        |base AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |tok0 AS (SELECT doc_id, unnest(toks) AS t, generate_subscripts(toks, 1) AS i FROM base),
        |ftok AS (SELECT doc_id, t, i, length(t) + 1 AS sl FROM tok0 WHERE length(t) BETWEEN 3 AND 23),
        |toks AS (SELECT DISTINCT t || ' ' AS s FROM ftok),
        |f(s, i, h) AS (
        |  SELECT s, 0, 0::HUGEINT FROM toks
        |  UNION ALL
        |  SELECT s, i + 1, (h * 31 + unicode(substr(s, i + 1, 1))) % 2305843009213693951::HUGEINT
        |  FROM f WHERE i < length(s)),
        |tokh AS (SELECT s, h FROM f WHERE i = length(s)),
        |pos AS (SELECT doc_id, t,
        |          sum(sl) OVER (PARTITION BY doc_id) - sum(sl) OVER (PARTITION BY doc_id ORDER BY i) AS suffix
        |        FROM ftok),
        |maxs AS (SELECT coalesce(max(suffix), 0)::INT AS m FROM pos),
        |pw(i, p) AS (
        |  SELECT 0, 1::HUGEINT
        |  UNION ALL
        |  SELECT i + 1, (p * 31) % 2305843009213693951::HUGEINT FROM pw WHERE i < (SELECT m FROM maxs)),
        |contrib AS (
        |  SELECT pos.doc_id, (tokh.h * pw.p) % 2305843009213693951::HUGEINT AS c
        |  FROM pos JOIN tokh ON tokh.s = pos.t || ' ' JOIN pw ON pw.i = pos.suffix),
        |fp AS (SELECT doc_id, sum(c) % 2305843009213693951::HUGEINT AS f FROM contrib GROUP BY 1)
        |SELECT d.doc_id, coalesce(fp.f, 0)::BIGINT AS fingerprint
        |FROM documents d LEFT JOIN fp USING (doc_id) ORDER BY doc_id""".stripMargin,

    "tx_token_counts" ->
      """SELECT doc_id,
        |len(string_split(text, ' ')) AS ws_tokens,
        |len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS re_tokens,
        |ceil(length(text)::DOUBLE / 4)::BIGINT AS bpe_est
        |FROM documents ORDER BY doc_id""".stripMargin,

    "tx_quality" -> {
      s"""WITH b AS (SELECT doc_id,
        |  len(string_split(text, ' '))::DOUBLE AS n_tok,
        |  len(list_distinct(string_split(text, ' ')))::DOUBLE AS n_dist,
        |  len(list_filter(string_split(text, ' '), x -> x IN $enList))::DOUBLE AS n_stop,
        |  length(text)::DOUBLE AS n_chars
        |  FROM documents),
        |c AS (SELECT doc_id, n_tok,
        |  n_dist / greatest(n_tok, 1.0) AS dr,
        |  n_stop / greatest(n_tok, 1.0) AS sr,
        |  (n_chars - (n_tok - 1)) / greatest(n_tok, 1.0) AS ml
        |  FROM b)
        |SELECT doc_id, n_tok::BIGINT AS n_tokens,
        |  floor(dr * 1e6 + 0.5) / 1e6 AS distinct_ratio,
        |  floor(sr * 1e6 + 0.5) / 1e6 AS stopword_ratio,
        |  floor(ml * 1e6 + 0.5) / 1e6 AS mean_token_len,
        |  floor((0.35 * least(n_tok / 64.0, 1.0) + 0.25 * dr
        |      + 0.2 * least(sr * 4.0, 1.0) + 0.2 * least(ml / 8.0, 1.0))
        |      * 1e6 + 0.5) / 1e6 AS quality
        |FROM c ORDER BY doc_id""".stripMargin
    },

    // the decode stub is a byte histogram normalized by byte count, so its
    // mass is exactly 1.0 for any non-empty payload and n_bytes is the
    // utf-8 length — an SQL-checkable conservation invariant of the plumbing
    "mm_features" ->
      """SELECT doc_id AS media_id, strlen(text)::BIGINT AS n_bytes,
        |round(CASE WHEN strlen(text) > 0 THEN 1.0 ELSE 0.0 END, 4) AS feature_mass
        |FROM documents ORDER BY media_id""".stripMargin,

    // payload = utf-8 text bytes (ascii testdata: strlen == byte length);
    // frames = 256-byte chunks sampled every 4th, last frame truncated
    "mm_frames" ->
      """WITH f AS (SELECT doc_id, strlen(text) AS len,
        |  unnest(range(0, cast(ceil(strlen(text)/256.0) AS BIGINT), 4)) AS i
        |  FROM documents)
        |SELECT doc_id AS media_id, i::BIGINT AS frame_idx,
        |  least(256, len - i*256)::BIGINT AS frame_len
        |FROM f ORDER BY media_id, frame_idx""".stripMargin
  )

  /** Shortest-round-trip double literal (Double.toString): DuckDB's decimal
    * parse recovers the identical IEEE754 value, so geometry embedded in the
    * oracle SQL is bit-equal to what the engine probes with. */
  private def dlit(x: Double): String = java.lang.Double.toString(x)

  /**
   * Contract oracle for `sim_ann_lsh` (closes the r3 no_oracle): the probe
   * geometry — the hyperplane matrix, a pure function of (seed, plane, dim)
   * — is embedded as literals, and the SQL independently recomputes every
   * vector's signature, the query signature, the hamming-ring widening rule
   * (initial radius from the budget loop, +1 ring while candidates < k,
   * capped at `planes`) and the exact-cosine top-k over the probed set.
   * Emitted only when the geometry makes the engine's budget fallback
   * unreachable (2^planes ≤ MaxProbeBuckets ⇔ planes ≤ 12 — always true for
   * auto-sized indexes below ~10^8 vectors), so SQL and engine provably
   * follow the same control path. None → driver rows-only check.
   */
  private def lshOracle: Option[String] = Pipelines.builtAnn.flatMap { idx =>
    val p = idx.planes
    val k = 10
    if (p > 12 || idx.dims <= 0) None
    else {
      val w = Similarity.planeMatrix(idx.seed, p, idx.dims)
      // engine's initial-probe budget loop (AnnIndex.query, probeHamming=2)
      def binom(n: Int, r: Int): Long =
        (1 to r).foldLeft(1L)((a, i) => a * (n - i + 1) / i)
      var probed = 0L
      var h = -1
      while (h < 2 && probed + binom(p, h + 1) <= Similarity.MaxProbeBuckets) {
        h += 1; probed += binom(p, h)
      }
      val hInit = h
      val planesValues = (0 until p).map(i =>
        s"($i, [${w(i).map(dlit).mkString(", ")}]::DOUBLE[])").mkString(", ")
      Some(s"""WITH pl(p, w) AS (VALUES $planesValues),
        |sg AS (
        |  SELECT e.vec_id,
        |    sum(CASE WHEN list_dot_product(e.embedding::DOUBLE[], pl.w) >= 0
        |        THEN (1::BIGINT << pl.p) ELSE 0 END)::BIGINT AS sig
        |  FROM embeddings e CROSS JOIN pl GROUP BY 1),
        |q AS (SELECT embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id = 0),
        |qn AS (SELECT sqrt(list_dot_product(e, e)) AS n FROM q),
        |qv AS (SELECT list_transform(q.e, x -> x / qn.n) AS v FROM q, qn),
        |qs AS (SELECT sig AS qsig FROM sg WHERE vec_id = 0),
        |cand AS (
        |  SELECT e.vec_id, list_dot_product(e.embedding::DOUBLE[], qv.v) AS cosine,
        |    bit_count(xor(sg.sig, qs.qsig)) AS ham
        |  FROM embeddings e JOIN sg USING (vec_id), qv, qs
        |  WHERE e.vec_id <> 0),
        |hstar AS (
        |  SELECT coalesce(min(i), $p) AS h FROM range($hInit, $p + 1) r(i)
        |  WHERE (SELECT count(*) FROM cand WHERE ham <= i) >= $k),
        |topk AS (
        |  SELECT vec_id, cosine FROM cand, hstar WHERE ham <= hstar.h
        |  ORDER BY cosine DESC, vec_id ASC LIMIT $k)
        |SELECT vec_id, floor(cosine * 1e6 + 0.5) / 1e6 AS cosine FROM topk
        |ORDER BY cosine DESC, vec_id ASC""".stripMargin)
    }
  }

  /**
   * Contract oracle for `sim_ann_ivf`: the trained centroids (deterministic
   * — sample selection, Lloyd arithmetic and 1e-6 quantization are all
   * data-defined, IvfDeterminism spec) are embedded as literals; the SQL
   * independently recomputes every vector's cell assignment (first-max-wins
   * argmax, as the engine's strict-> scan), the query's cell preference
   * order, the cell-widening rule (start at nprobe=2, +1 cell while
   * candidates < k) and the exact-cosine top-k over the probed cells.
   */
  private def ivfOracle: Option[String] = Pipelines.builtIvf.flatMap { idx =>
    val cents = idx.centroids
    val nCells = cents.length
    val k = 10
    val nprobe = 2
    if (nCells == 0 || nCells > 4096) None
    else {
      val centValues = cents.indices.map(c =>
        s"($c, [${cents(c).map(dlit).mkString(", ")}]::DOUBLE[])").mkString(", ")
      Some(s"""WITH ct(c, v) AS (VALUES $centValues),
        |asg AS (
        |  SELECT vec_id, c FROM (
        |    SELECT e.vec_id, ct.c,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY list_dot_product(e.embedding::DOUBLE[], ct.v) DESC, ct.c ASC) AS rn
        |    FROM embeddings e CROSS JOIN ct) WHERE rn = 1),
        |q AS (SELECT embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id = 0),
        |qn AS (SELECT sqrt(list_dot_product(e, e)) AS n FROM q),
        |qv AS (SELECT list_transform(q.e, x -> x / qn.n) AS v FROM q, qn),
        |pref AS (
        |  SELECT ct.c, row_number() OVER (
        |    ORDER BY list_dot_product(qv.v, ct.v) DESC, ct.c ASC) AS rk
        |  FROM ct, qv),
        |cand AS (
        |  SELECT e.vec_id, list_dot_product(e.embedding::DOUBLE[], qv.v) AS cosine, pref.rk
        |  FROM embeddings e JOIN asg USING (vec_id) JOIN pref USING (c), qv
        |  WHERE e.vec_id <> 0),
        |mstar AS (
        |  SELECT coalesce(min(i), $nCells) AS m FROM range($nprobe, $nCells + 1) r(i)
        |  WHERE (SELECT count(*) FROM cand WHERE rk <= i) >= $k),
        |topk AS (
        |  SELECT vec_id, cosine FROM cand, mstar WHERE rk <= mstar.m
        |  ORDER BY cosine DESC, vec_id ASC LIMIT $k)
        |SELECT vec_id, floor(cosine * 1e6 + 0.5) / 1e6 AS cosine FROM topk
        |ORDER BY cosine DESC, vec_id ASC""".stripMargin)
    }
  }
}
