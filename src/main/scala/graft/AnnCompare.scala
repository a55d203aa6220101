package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Hashing, Similarity}

/**
 * ANN index-selection probe (perf tooling): LSH (data-independent
 * hyperplanes) vs IVF (data-adaptive trained cells) on two corpus shapes —
 * planted clusters (the common embedding shape: points concentrate around
 * semantic modes) and uniform-random (no structure for IVF to learn).
 * Reports build time, mean query latency, and recall@10 vs brute force,
 * feeding the measured index-selection rule in BENCH/BASELINE.md.
 * SPARK_GRAFT_ANN_N / _DIM / _QUERIES override sizes.
 */
object AnnCompare {

  private def prng(a: Long, b: Long): Double = {
    val h = Hashing.mix(Hashing.mix(a * 7919L) ^ b)
    (h >>> 11).toDouble / (1L << 53).toDouble - 0.5
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_ANN_N", "2000").toInt
    val dim = sys.env.getOrElse("SPARK_GRAFT_ANN_DIM", "64").toInt
    val nQueries = sys.env.getOrElse("SPARK_GRAFT_ANN_QUERIES", "20").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def normalize(v: Array[Double]): Seq[Float] = {
      val nm = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / nm).toFloat).toSeq
    }
    // planted: n/25 clusters, 5% noise around each center
    val nClusters = math.max(2, n / 25)
    val planted = (0 until n).map { id =>
      val c = id % nClusters
      (id.toLong, normalize(Array.tabulate(dim)(d =>
        prng(c, d) + 0.05 * prng(1000000L + id, d))))
    }.toDF("vec_id", "embedding")
    // random: no structure
    val random = (0 until n).map { id =>
      (id.toLong, normalize(Array.tabulate(dim)(d => prng(5000000L + id, d))))
    }.toDF("vec_id", "embedding")

    def t[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    for ((shape, df0) <- Seq("planted" -> planted, "random" -> random)) {
      val df = df0.cache(); df.count()
      val queryIds = (0 until nQueries).map(i => (i * (n / nQueries)).toLong)
      val queryVecs = df.filter(col("vec_id").isin(queryIds: _*))
        .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
      val brute: Map[Long, Set[Long]] = queryIds.map { qid =>
        qid -> Similarity.annBrute(df, queryVecs(qid), qid, 10)
          .collect().map(_.getLong(0)).toSet
      }.toMap

      def report(name: String, buildSec: Double,
          query: (Array[Float], Long) => Array[Long]): Unit = {
        query(queryVecs(queryIds.head), queryIds.head) // warm cache
        var recall = 0.0
        val (_, qSec) = t {
          queryIds.foreach { qid =>
            val got = query(queryVecs(qid), qid).toSet
            recall += (got intersect brute(qid)).size / 10.0
          }
        }
        println(f"[anncompare] $shape%-7s $name%-5s n=$n build=$buildSec%6.2fs " +
          f"query_mean=${qSec / nQueries}%6.3fs recall@10=${recall / nQueries}%.2f")
      }

      val (lsh, lshSec) = t(Similarity.buildAnnIndex(df))
      report("lsh", lshSec, (q, id) =>
        lsh.query(q, id, 10).collect().map(_.getLong(0)))
      val (ivf, ivfSec) = t(Similarity.buildIvfIndex(df))
      report("ivf", ivfSec, (q, id) =>
        ivf.query(q, id, 10, nprobe = 2).collect().map(_.getLong(0)))
      lsh.unpin(); ivf.unpin(); df.unpersist()
    }
    spark.stop()
  }
}
