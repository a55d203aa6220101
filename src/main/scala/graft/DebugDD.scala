package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ir.Analyzer

/** One-off dedup-intermediate cardinality probe (r7 optimization round). */
object DebugDD {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val shUdf = udf((t: String) => {
      val sh = Dedup.shingles(Analyzer.analyze(t, Analyzer.Plain))
      val out = new Array[Long](sh.length)
      var i = 0
      while (i < sh.length) { out(i) = Hashing.fnv1a64(sh(i)); i += 1 }
      out.distinct
    })
    val sets = docs.select(col("doc_id"), shUdf(col("text")).as("sh")).cache()
    val n = sets.count()
    val inst = sets.select(sum(size(col("sh")))).head().getLong(0)
    val exploded = sets.select(col("doc_id"), explode(col("sh")).as("s")).cache()
    val distinctSh = exploded.select("s").distinct().count()
    val hist = exploded.groupBy("s").count()
      .select(sum((col("count") * (col("count") - 1) / 2).cast("long")).as("pairs"),
        max("count").as("maxc")).head()
    println(s"[dd] docs=$n shingleInstances=$inst distinct=$distinctSh " +
      s"joinPairs=${hist.getLong(0)} hottestShingleDocs=${hist.getLong(1)}")
    // minhash candidates
    val sigUdf = udf((sh: Seq[Long]) => Dedup.minhashSig(sh.toArray))
    val banded = sets.select(col("doc_id"), sigUdf(col("sh")).as("sig"))
    println("[dd] sig rows=" + banded.count())
    val bandedMh = sets
      .select(col("doc_id"), sigUdf(col("sh")).as("sig"))
      .select(col("doc_id"), posexplode({
        val bandsUdf = udf { (sig: Seq[Long]) =>
          sig.grouped(Dedup.BandSize).zipWithIndex.map { case (band, i) =>
            (i, Hashing.mix(band.foldLeft(i.toLong)((a, b) => Hashing.mix(a ^ b))))
          }.toSeq
        }
        bandsUdf(col("sig"))
      }).as(Seq("band", "bucket")))
    val mhPairs = bandedMh.groupBy("band", "bucket").count()
      .filter(col("count") > 1)
      .select(sum((col("count") * (col("count") - 1) / 2).cast("long")))
      .head().getLong(0)
    println(s"[dd] minhash bucket pair instances=$mhPairs")
    val lsh = Dedup.minhashLsh(docs, 0.5)
    println("[dd] lsh result=" + lsh.count())
    spark.stop()
  }
}
