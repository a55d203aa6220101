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
    def timed(name: String)(body: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[dd] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s  ($r)")
    }
    // phase decomposition of minhashLsh (replicated shapes)
    val sets2 = docs.select(col("doc_id"), shUdf(col("text")).as("sh"))
      .cache()
    timed("mh sets materialize")(sets2.count())
    val bandsUdf2 = udf { (sig: Seq[Long]) =>
      sig.grouped(Dedup.BandSize).zipWithIndex.map { case (band, i) =>
        (i, Hashing.mix(band.foldLeft(i.toLong)((a, b) => Hashing.mix(a ^ b))))
      }.toSeq
    }
    val banded2 = sets2
      .select(col("doc_id"), sigUdf(col("sh")).as("sig"))
      .select(col("doc_id"), posexplode(bandsUdf2(col("sig"))).as(Seq("band", "bucket")))
    timed("mh sig+banded count")(banded2.count())
    val ok2 = banded2.groupBy("band", "bucket").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1 && col("n") <= 1000).select("band", "bucket")
    val buckets2 = banded2.join(ok2, Seq("band", "bucket"))
      .groupBy("band", "bucket").agg(collect_list("doc_id").as("ids"))
    val pairsUdf2 = udf((ids: Seq[Long]) => {
      val s = ids.distinct.sorted
      for (i <- s.indices; j <- i + 1 until s.length) yield (s(i), s(j))
    })
    val pairs2 = buckets2.select(explode(pairsUdf2(col("ids"))).as("p"))
      .select(col("p._1").as("doc_a"), col("p._2").as("doc_b"))
      .distinct()
    timed("mh buckets+pairs")(pairs2.count())
    val verify2 = pairs2
      .join(sets2.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sets2.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= 0.5)
    timed("mh verify")(verify2.count())
    timed("mh full (2nd time)")(Dedup.minhashLsh(docs, 0.5).count())
    timed("mh full (3rd time)")(Dedup.minhashLsh(docs, 0.5).count())
    spark.stop()
  }
}
