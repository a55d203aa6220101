package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/**
 * Similarity search over an embedding column (`Array[Float]`, unit-norm).
 *
 * Baseline: brute-force cosine top-k — a single scan + TakeOrderedAndProject
 * (per-partition heaps, no global sort), the exact-recall reference.
 *
 * Scale path: an AnnIndex — the hyperplane signature is computed ONCE at
 * ingest and persisted as a column, sig-clustered (repartition + sort for
 * the cached form; `partitionBy("sig")` for the parquet form), so a query
 * probes buckets via a pushable `sig IN (...)` filter (batch/partition
 * pruning) instead of sweeping the corpus with a per-query UDF
 * (VERDICT r1 #2). Recall/latency trades on the probe hamming radius;
 * short buckets widen ring-by-ring, never falling back to a full scan.
 * Hyperplanes are derived from a splittable counter PRNG (seed, plane, dim)
 * so the index is deterministic at any parallelism.
 */
object Similarity {

  val NumPlanes = 8 // default: 256 buckets; hamming<=2 probe = 37/256 ≈ 14%

  /** Per-query cap on enumerated probe buckets (initial probes + ring
    * widening). Past it, the query falls back to ONE exact full scan — at
    * that point the rings cover a large corpus fraction anyway, and a scan
    * beats a combinatorial IN list in both planning and execution. */
  val MaxProbeBuckets = 4096L

  /** Below this many vectors the in-memory index skips the cluster-by-key
    * exchange + sort before pinning (guide §2: partitioning derived from
    * input size): batch min/max pruning saves at most a full scan of the
    * cache, and under ~10^5 vectors that scan costs less than the one-time
    * shuffle+sort — forever. Durable (parquet) layouts keep partitionBy
    * clustering at every size, and large corpora are unaffected. */
  val ClusterRowThreshold = 262144L

  /** Auto-sized hyperplane count: target ~16 vectors per bucket —
    * `ceil(log2(n/16))` clamped to [4, 24]. More planes = smaller buckets =
    * sharper pruning; ring-widening already guarantees k results, so the
    * only cost of over-splitting is extra (pruned) probes. At 10^9 vectors
    * this yields 24 planes → ~2^24 buckets of ~60 vectors; the hamming≤2
    * probe reads 301 buckets ≈ 18k vectors, corpus-size-independent. */
  private[ops] def autoPlanes(n: Long): Int =
    math.min(24, math.max(4,
      math.ceil(math.log(math.max(1.0, n / 16.0)) / math.log(2)).toInt))

  /** Dot product of two float-array columns. A tight primitive loop beats
    * the zip_with+aggregate higher-order form ~5× on all-pairs joins: the
    * HOF materializes a 64-element intermediate array per invocation, which
    * at 10^7+ pairs is pure GC pressure. Accumulates in double, sequential
    * order (matches the DuckDB oracle's accumulation for bit-stable
    * round(…,6) comparison). */
  private val dotUdf = udf((a: Seq[Double], b: Seq[Double]) => {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  })

  def dotCol(a: Column, b: Column): Column =
    dotUdf(a.cast("array<double>"), b.cast("array<double>"))

  /** Brute-force cosine top-k of a query vector. Output (vec_id, cosine),
    * score desc, vec_id asc tie-break; excludes the query id itself. */
  def annBrute(embeddings: DataFrame, query: Array[Float], queryId: Long, k: Int): DataFrame = {
    val qNorm = math.sqrt(query.map(x => x.toDouble * x).sum)
    val qLit = typedLit(query.map(_.toDouble / qNorm).toSeq)
    embeddings
      .filter(col("vec_id") =!= queryId)
      .withColumn("cosine", dotCol(col("embedding"), qLit))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(k)
      .select("vec_id", "cosine")
  }

  /** Deterministic random hyperplane component for (plane, dim). */
  private def plane(seed: Long, p: Int, d: Int): Double = {
    val h = Hashing.mix(Hashing.mix(seed ^ (p.toLong << 32)) ^ d.toLong)
    // map to [-1, 1)
    (h >>> 11).toDouble / (1L << 52).toDouble - 1.0
  }

  /** The hyperplane weight matrix [planes][dims] — exposed so the driver's
    * contract oracle (SparkEntry) can embed the exact geometry the index
    * probes with into self-contained verification SQL. */
  private[graft] def planeMatrix(seed: Long, planes: Int, dims: Int): Array[Array[Double]] =
    Array.tabulate(planes, dims)((p, d) => plane(seed, p, d))

  private[ops] def signature(vec: Seq[Float], seed: Long, planes: Int = NumPlanes): Int = {
    var sig = 0
    var p = 0
    while (p < planes) {
      var dot = 0.0
      var d = 0
      while (d < vec.length) { dot += vec(d) * plane(seed, p, d); d += 1 }
      if (dot >= 0) sig |= (1 << p)
      p += 1
    }
    sig
  }

  /** [[signature]] against a PRECOMPUTED plane matrix: `plane(seed, p, d)` is
    * a pure function, but the per-row UDF form re-derived it (two SplitMix64
    * rounds per element) for every (row, plane, dim) — at 10^9 vectors ×
    * 24 planes × 64 dims that is the dominant cost of the ingest signature
    * pass. Same values, same multiplication order → bit-identical
    * signatures (the build UDFs fall back to [[signature]] when a row's
    * width differs from the probed dims, so equivalence is unconditional). */
  private[ops] def signatureW(vec: Seq[Float], w: Array[Array[Double]]): Int = {
    var sig = 0
    var p = 0
    while (p < w.length) {
      val wp = w(p)
      var dot = 0.0
      var d = 0
      while (d < vec.length) { dot += vec(d) * wp(d); d += 1 }
      if (dot >= 0) sig |= (1 << p)
      p += 1
    }
    sig
  }

  /** All signatures at exactly hamming distance `h` from `sig`. */
  private[ops] def ring(sig: Int, h: Int, planes: Int = NumPlanes): Seq[Int] =
    if (h == 0) Seq(sig)
    else (0 until planes).combinations(h)
      .map(bits => bits.foldLeft(sig)((s, b) => s ^ (1 << b)))
      .toSeq

  /**
   * ANN index: embeddings with their hyperplane signature persisted as a
   * column, clustered by signature so a `sig IN (...)` probe prunes at scan
   * level. Build once, query many — the reference analog of precomputed
   * retrieval data loaded at server start (`ir_manager.py:137-156`).
   */
  final class AnnIndex private[ops] (
      val data: DataFrame, val seed: Long, val planes: Int = NumPlanes,
      val dims: Int = 0) {

    /**
     * Top-k by exact cosine among vectors within `probeHamming` of the
     * query signature; widens one hamming ring at a time (scanning ONLY the
     * new ring's buckets) while fewer than k hits. The per-query probe
     * enumeration is budgeted ([[Similarity.MaxProbeBuckets]]): with
     * auto-sized plane counts, C(planes, h) grows combinatorially, and a
     * ring that would blow the budget means the query needs a large slice
     * of the corpus anyway — so the widening ends in ONE exact full scan
     * (still correct, recall 1) instead of a million-literal IN filter.
     * Eager: 1 Spark job plus 1 per extra ring (rare).
     */
    def query(
        query: Array[Float],
        excludeId: Long,
        k: Int,
        probeHamming: Int = 2): DataFrame = {
      val spark = data.sparkSession
      val qNorm = math.sqrt(query.map(x => x.toDouble * x).sum)
      val qLit = typedLit(query.map(_.toDouble / qNorm).toSeq)
      val qSig = signature(query.toSeq, seed, planes)

      def scan(probes: Option[Seq[Int]]): Array[Row] =
        probes.fold(data)(p => data.filter(col("sig").isin(p: _*))) // pushed
          .filter(col("vec_id") =!= excludeId)
          .withColumn("cosine", dotCol(col("embedding"), qLit))
          .orderBy(col("cosine").desc, col("vec_id").asc)
          .limit(k)
          .select("vec_id", "cosine")
          .collect()

      def binom(n: Int, r: Int): Long =
        (1 to r).foldLeft(1L)((a, i) => a * (n - i + 1) / i) // exact, n ≤ 24

      // initial probe set, clamped to the budget (a caller-passed wide
      // probeHamming with many planes must not enumerate millions)
      var probed = 0L
      var h = -1
      while (h < probeHamming && probed + binom(planes, h + 1) <= MaxProbeBuckets) {
        h += 1
        probed += binom(planes, h)
      }
      var hits =
        if (h < 0) scan(None) // budget smaller than ring 0: exact scan
        else scan(Some((0 to h).flatMap(ring(qSig, _, planes))))
      var exact = h < 0
      while (hits.length < k && h < planes && !exact) {
        h += 1
        if (probed + binom(planes, h) > MaxProbeBuckets) {
          hits = scan(None) // exact full scan: complete answer, stop widening
          exact = true
        } else {
          probed += binom(planes, h)
          hits = (hits ++ scan(Some(ring(qSig, h, planes))))
            .sortBy(r => (-r.getDouble(1), r.getLong(0))).take(k)
        }
      }
      val schema = StructType(Seq(
        StructField("vec_id", LongType, nullable = false),
        StructField("cosine", DoubleType, nullable = false)))
      spark.createDataFrame(spark.sparkContext.parallelize(hits.toSeq, 1), schema)
    }

    def unpin(): Unit = { data.unpersist(); () }
  }

  /** In-memory index: signature computed once, sig-clustered and pinned in
    * executor storage. Cached batch min/max stats on the sorted `sig` column
    * give batch-level pruning for the probe filter.
    * @param planes 0 (default) = auto-size from the corpus (`autoPlanes`) */
  def buildAnnIndex(embeddings: DataFrame, seed: Long = 42L, planes: Int = 0): AnnIndex = {
    // corpus size and dims in ONE agg job (was a count plus a head — each a
    // full fixed-cost Spark action on the build path); min(size) == the
    // uniform embedding width, recorded on the index so the oracle/probe
    // geometry is self-describing
    val (n, dims) = {
      val r = embeddings.agg(
        count(lit(1)), min(size(col("embedding")))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0 else r.getInt(1))
    }
    val p = if (planes > 0) planes else autoPlanes(n)
    val w = planeMatrix(seed, p, dims)
    val sigUdf = udf((v: Seq[Float]) =>
      if (v.length == dims) signatureW(v, w) else signature(v, seed, p))
    // below the cluster threshold, still widen a single-file scan BEFORE the
    // signature projection so the per-row kernel parallelizes (Narrow —
    // no-op on at-scale inputs; the clustered branch redistributes anyway)
    val base = if (n >= ClusterRowThreshold) embeddings else Narrow.widen(embeddings)
    val signed = base.withColumn("sig", sigUdf(col("embedding")))
    val df = (if (n >= ClusterRowThreshold)
      signed.repartition(col("sig")).sortWithinPartitions("sig")
    else signed)
      .persist(StorageLevel.MEMORY_AND_DISK)
    new AnnIndex(df, seed, p, dims)
  }

  /** Sidecar I/O through the output path's Hadoop FileSystem (ADVICE r3):
    * the vectors go through Spark's Hadoop writers, so a java.nio local-file
    * sidecar would hard-fail on hdfs:// or s3:// paths AFTER the expensive
    * parquet write — route the sidecar through the same FileSystem. */
  private def writeSidecar(spark: SparkSession, dir: String, name: String,
      content: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir, name)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readSidecar(spark: SparkSession, dir: String, name: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(dir, name)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val len = fs.getFileStatus(p).getLen.toInt
      val buf = new Array[Byte](len)
      val in = fs.open(p)
      try in.readFully(0, buf)
      finally in.close()
      Some(new String(buf, java.nio.charset.StandardCharsets.UTF_8))
    }
  }

  /** Durable index: parquet laid out `partitionBy(sig)` — the probe filter
    * becomes directory-level partition pruning (the 100 TB path; auto-sized
    * planes keep buckets bounded at any corpus size). Seed, plane count and
    * dims ride a sidecar so the loaded index probes with the ingest
    * geometry; the sidecar goes through the path's Hadoop FileSystem so
    * non-local destinations (hdfs://, s3a://) work like the data does. */
  def saveAnnIndex(
      embeddings: DataFrame, path: String, seed: Long = 42L, planes: Int = 0): Unit = {
    val (n, dims) = {
      val r = embeddings.agg(
        count(lit(1)), min(size(col("embedding")))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0 else r.getInt(1))
    }
    val p = if (planes > 0) planes else autoPlanes(n)
    val w = planeMatrix(seed, p, dims)
    val sigUdf = udf((v: Seq[Float]) =>
      if (v.length == dims) signatureW(v, w) else signature(v, seed, p))
    embeddings
      .withColumn("sig", sigUdf(col("embedding")))
      .write.mode("overwrite").partitionBy("sig").parquet(path)
    writeSidecar(embeddings.sparkSession, path, "_ann_meta.tsv", s"$seed\t$p\t$dims\n")
  }

  def loadAnnIndex(spark: SparkSession, path: String): AnnIndex = {
    val meta = readSidecar(spark, path, "_ann_meta.tsv").getOrElse(
      throw new IllegalArgumentException(
        s"loadAnnIndex: missing $path/_ann_meta.tsv (index not written by saveAnnIndex?)"))
    val Array(seed, p, dims) = meta.trim.split("\t")
    new AnnIndex(spark.read.parquet(path), seed.toLong, p.toInt, dims.toInt)
  }

  // ------------------------------------------------------------------ IVF

  /**
   * IVF (inverted-file) ANN: a coarse k-means quantizer assigns every
   * vector to a cell; a query scans only its `nprobe` nearest cells. The
   * complementary scale path to the hyperplane AnnIndex: LSH buckets are
   * data-independent (stable under any distribution, no training pass),
   * IVF cells adapt to the data (tighter candidate sets on clustered
   * corpora, the common embedding shape).
   *
   * Determinism: centroids are seeded from the vectors with the smallest
   * mixed vec_id hashes (data-defined, parallelism-independent) and each
   * Lloyd update quantizes centroid coordinates to 1e-6 — double-summation
   * order noise (±1 ulp across partitionings) is absorbed by the
   * quantization, so cell assignments are stable at any parallelism.
   */
  final class IvfIndex private[ops] (
      val data: DataFrame, // (vec_id, embedding, cell) cell-clustered, persisted
      val centroids: Array[Array[Double]],
      /** Mean cosine of the training sample to its assigned centroid,
        * 1e-6-quantized — the drift baseline for append-time retrain
        * decisions. NaN on indexes loaded from a pre-drift sidecar. */
      val trainMeanCos: Double = Double.NaN) {

    /**
     * Assign-only append (r3 verdict #7): new vectors route through the
     * FROZEN trained centroids — no retrain pass, no touch of existing
     * rows' assignments (queries over old vectors stay identical). The
     * coarse quantizer only routes probes and the exact rerank happens
     * inside the cell, so frozen centroids stay correct for any append;
     * they only lose EFFICIENCY if the new data's distribution drifts —
     * which [[assignDrift]] measures and [[needsRetrain]] thresholds.
     */
    def append(newVectors: DataFrame): IvfIndex = {
      val cents = centroids
      val assignUdf = udf((v: Seq[Float]) => bestCell(v, cents)._1)
      val combined = data.unionByName(
        newVectors.select(col("vec_id"), col("embedding"))
          .withColumn("cell", assignUdf(col("embedding"))))
        .repartition(col("cell"))
        .sortWithinPartitions("cell")
        .persist(StorageLevel.MEMORY_AND_DISK)
      new IvfIndex(combined, centroids, trainMeanCos)
    }

    /** Mean cosine of `vectors` to their nearest frozen centroid — one agg
      * pass, no driver collect of vectors. */
    def meanAssignCos(vectors: DataFrame): Double = {
      val cents = centroids
      val cosUdf = udf((v: Seq[Float]) => {
        val (_, dot) = bestCell(v, cents)
        var s = 0.0
        var d = 0
        while (d < v.length) { s += v(d).toDouble * v(d); d += 1 }
        val n = math.sqrt(s)
        if (n > 0) dot / n else 0.0
      })
      vectors.select(avg(cosUdf(col("embedding")))).head().getDouble(0)
    }

    /** Positive drift = the batch sits farther from the trained centroids
      * than the training data did (mean cosine gap). */
    def assignDrift(newVectors: DataFrame): Double =
      if (trainMeanCos.isNaN) Double.NaN
      else trainMeanCos - meanAssignCos(newVectors)

    /** Retrain trigger: the appended batch's mean assignment cosine fell
      * more than `tolerance` below the training baseline — cells no longer
      * fit the data and probe candidate sets are inflating. */
    def needsRetrain(newVectors: DataFrame, tolerance: Double = 0.05): Boolean = {
      val d = assignDrift(newVectors)
      !d.isNaN && d > tolerance
    }

    private def nearestCells(q: Array[Float], nprobe: Int): Seq[Int] = {
      val qn = math.sqrt(q.map(x => x.toDouble * x).sum)
      centroids.indices
        .sortBy { c =>
          var s = 0.0
          var d = 0
          while (d < q.length) { s += q(d) / qn * centroids(c)(d); d += 1 }
          (-s, c)
        }
        .take(math.max(1, nprobe))
    }

    /** Top-k exact cosine among the `nprobe` nearest cells; widens one cell
      * at a time while fewer than k hits (never a full-corpus fallback). */
    def query(
        query: Array[Float],
        excludeId: Long,
        k: Int,
        nprobe: Int = 2): DataFrame = {
      val spark = data.sparkSession
      val qNorm = math.sqrt(query.map(x => x.toDouble * x).sum)
      val qLit = typedLit(query.map(_.toDouble / qNorm).toSeq)
      val order = nearestCells(query, centroids.length) // full preference order

      def scan(cells: Seq[Int]): Array[Row] =
        data.filter(col("cell").isin(cells: _*)) // pushed: batch/partition pruning
          .filter(col("vec_id") =!= excludeId)
          .withColumn("cosine", dotCol(col("embedding"), qLit))
          .orderBy(col("cosine").desc, col("vec_id").asc)
          .limit(k)
          .select("vec_id", "cosine")
          .collect()

      var probe = math.max(1, nprobe)
      var hits = scan(order.take(probe))
      while (hits.length < k && probe < order.length) {
        probe += 1
        hits = (hits ++ scan(Seq(order(probe - 1))))
          .sortBy(r => (-r.getDouble(1), r.getLong(0))).take(k)
      }
      val schema = StructType(Seq(
        StructField("vec_id", LongType, nullable = false),
        StructField("cosine", DoubleType, nullable = false)))
      spark.createDataFrame(spark.sparkContext.parallelize(hits.toSeq, 1), schema)
    }

    def unpin(): Unit = { data.unpersist(); () }
  }

  private def quantize(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** Nearest centroid by raw dot (strict >, first max wins — the assignment
    * rule everywhere: build, append, oracle). Returns (cell, dot). */
  private[ops] def bestCell(v: Seq[Float], cs: Array[Array[Double]]): (Int, Double) = {
    var best = 0
    var bestDot = Double.MinValue
    var c = 0
    while (c < cs.length) {
      var s = 0.0
      var d = 0
      while (d < v.length) { s += v(d) * cs(c)(d); d += 1 }
      if (s > bestDot) { bestDot = s; best = c }
      c += 1
    }
    (best, bestDot)
  }

  /** Training-sample row cap: ~16 rows per centroid is plenty for a COARSE
    * quantizer (it only routes probes; the exact rerank happens inside the
    * cell), and the hard cap bounds driver memory at ~67 MB of doubles even
    * at the nCells ceiling. */
  private[ops] val IvfSampleCap = 131072

  /**
   * Train the coarse quantizer on a bounded deterministic SAMPLE, then run
   * ONE distributed assign pass (the r2 design Lloyd-iterated over the full
   * corpus — ~6 uncached full passes, which at 100 TB is not an option;
   * VERDICT r2 #1). The sample is data-defined — the `sampleN` vectors with
   * the smallest mixed vec_id hashes — so training sees the same rows in
   * the same order at any parallelism, and the driver-local Lloyd loop is
   * sequential arithmetic: the index is bit-deterministic. Spark jobs:
   * count + sample take-ordered + the single assign pass, instead of
   * 2 + 2·iters full-corpus jobs.
   *
   * @param nCells 0 (default) = auto: ≈√n clamped to [4, 4096] — the
   *               standard IVF balance point (≈√n probe candidates per cell)
   */
  def buildIvfIndex(
      embeddings: DataFrame,
      nCells: Int = 0,
      iters: Int = 4,
      seed: Long = 42L): IvfIndex = {
    val input = embeddings.select(col("vec_id"), col("embedding"))
    val n = input.count() // column-pruned: parquet-metadata-cheap
    require(n > 0, "buildIvfIndex: embeddings table is empty")
    val k = if (nCells > 0) nCells
      else math.min(4096L, math.max(4L, math.round(math.sqrt(n.toDouble)))).toInt
    val sampleN = math.min(n, math.min(IvfSampleCap.toLong,
      math.max(10000L, 16L * k))).toInt

    // deterministic data-defined sample (the r2 seed trick, sized for
    // training): rows whose mixed vec_id hash falls under a threshold
    // targeting 2× the sample size. A scan + pushable filter + collect —
    // no sort, no shuffle, at ANY corpus size (orderBy+limit above Spark's
    // top-K fallback threshold would degrade to a global sort). The sample
    // set is hash-defined, the sequence driver-sorted: both
    // partitioning-independent.
    val keepFrac = math.min(1.0, 2.0 * sampleN / n)
    // exact unsigned offset arithmetic: (keepFrac * 2^64).toLong saturates
    // at Long.MaxValue for keepFrac > 0.5, which would silently clamp the
    // threshold to ~50% — route through BigDecimal so MinValue + offset is
    // computed in full precision and only then narrowed
    val thresh =
      if (keepFrac >= 1.0) Long.MaxValue
      else (BigDecimal(Long.MinValue) +
        BigDecimal(keepFrac) * BigDecimal(2).pow(64)).toLong
    val sample: Array[Array[Double]] = input
      .withColumn("h", xxhash64(col("vec_id"), lit(seed)))
      .filter(col("h") <= thresh)
      .select(col("h"), col("vec_id"), col("embedding"))
      .collect()
      .sortBy(r => (r.getLong(0), r.getLong(1)))
      .take(sampleN)
      .map(_.getSeq[Float](2).map(_.toDouble).toArray)
      .map(v => {
        val nm = math.sqrt(v.map(x => x * x).sum)
        if (nm > 0) v.map(_ / nm) else v
      })

    // driver-local spherical k-means on the sample; seeds = first k sample
    // vectors (the smallest-hash rows, exactly the r2 seed rule)
    var cents: Array[Array[Double]] =
      Array.tabulate(math.min(k, sample.length))(sample(_).clone())
    val dim = cents(0).length
    def nearest(v: Array[Double], cs: Array[Array[Double]]): Int = {
      var best = 0; var bestDot = Double.MinValue
      var c = 0
      while (c < cs.length) {
        var s = 0.0; var d = 0
        while (d < v.length) { s += v(d) * cs(c)(d); d += 1 }
        if (s > bestDot) { bestDot = s; best = c }
        c += 1
      }
      best
    }
    (1 to iters).foreach { _ =>
      val sums = Array.fill(cents.length)(new Array[Double](dim))
      val counts = new Array[Long](cents.length)
      sample.foreach { v =>
        val c = nearest(v, cents)
        counts(c) += 1
        var d = 0
        while (d < dim) { sums(c)(d) += v(d); d += 1 }
      }
      cents = Array.tabulate(cents.length) { c =>
        if (counts(c) == 0L) cents(c) // empty cell: keep previous centroid
        else {
          val m = sums(c).map(x => quantize(x / counts(c)))
          val norm = math.sqrt(m.map(x => x * x).sum)
          if (norm > 0) m.map(x => quantize(x / norm)) else cents(c)
        }
      }
    }

    // drift baseline: mean assignment cosine of the (normalized) training
    // sample under the final centroids — one driver pass, same cost as one
    // Lloyd iteration; quantized so it is parallelism-independent
    val finalCents = cents
    val trainMeanCos = quantize(
      sample.iterator.map(v => bestCell(v.map(_.toFloat).toSeq, finalCents)._2).sum
        / math.max(1, sample.length))

    // ONE full pass: assign every vector to its trained cell and cluster
    // (cluster exchange skipped below ClusterRowThreshold — see there)
    val assignUdf = udf((v: Seq[Float]) => bestCell(v, finalCents)._1)
    // the assign kernel is n × √n-cells × dims flops — widen a single-file
    // scan BEFORE the assign projection so it does not run on one core
    // (measured 1.0 s serialized at sf0.1; Narrow is a no-op on at-scale
    // inputs, and the clustered branch redistributes via its own exchange)
    val aBase = if (n >= ClusterRowThreshold) embeddings else Narrow.widen(embeddings)
    val assigned = aBase.withColumn("cell", assignUdf(col("embedding")))
    val df = (if (n >= ClusterRowThreshold)
      assigned.repartition(col("cell")).sortWithinPartitions("cell")
    else assigned)
      .persist(StorageLevel.MEMORY_AND_DISK)
    new IvfIndex(df, finalCents, trainMeanCos)
  }

  /** Durable IVF: vectors laid out `partitionBy(cell)` (probe = directory
    * pruning) with the trained centroids in a JSON-lines sidecar. */
  def saveIvfIndex(idx: IvfIndex, path: String): Unit = {
    idx.data.write.mode("overwrite").partitionBy("cell").parquet(path)
    val lines = idx.centroids.map(_.mkString("[", ",", "]")) ++
      (if (idx.trainMeanCos.isNaN) Seq.empty
       else Seq(s"meanCos\t${idx.trainMeanCos}"))
    writeSidecar(idx.data.sparkSession, path, "_centroids.jsonl",
      lines.mkString("", "\n", "\n"))
  }

  def loadIvfIndex(spark: SparkSession, path: String): IvfIndex = {
    val lines = readSidecar(spark, path, "_centroids.jsonl").getOrElse(
      throw new IllegalArgumentException(
        s"loadIvfIndex: missing $path/_centroids.jsonl (index not written by saveIvfIndex?)"))
      .split("\n")
      .filter(_.nonEmpty)
    val cents = lines.filter(_.startsWith("["))
      .map(_.stripPrefix("[").stripSuffix("]").split(",").map(_.toDouble))
    val meanCos = lines.collectFirst {
      case l if l.startsWith("meanCos\t") => l.stripPrefix("meanCos\t").toDouble
    }.getOrElse(Double.NaN)
    new IvfIndex(spark.read.parquet(path), cents, meanCos)
  }

  /** One-shot convenience over a transient index (SparkEntry/tests). For
    * serving, build the index once and reuse it across queries. */
  def annLsh(
      embeddings: DataFrame,
      query: Array[Float],
      queryId: Long,
      k: Int,
      seed: Long = 42L,
      probeHamming: Int = 2): DataFrame = {
    val idx = buildAnnIndex(embeddings, seed)
    try idx.query(query, queryId, k, probeHamming) // eager — unpin is safe
    finally idx.unpin()
  }
}
