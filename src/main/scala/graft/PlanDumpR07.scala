package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Round-7 plan capture: writes `.explain("formatted")` for each named sweep
  * query to plans/r07/<query>_<suffix>.txt, under the driver sweep's session
  * config (local[$SPARK_GRAFT_CPUS], shuffle=16, AQE off).
  *
  *   sbt "runMain graft.PlanDumpR07 <suffix> [queryName ...]"
  */
object PlanDumpR07 {
  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("before")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString).toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    Files.createDirectories(Paths.get("plans/r07"))
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        df.count() // materialize (memoized builds, AQE-final shape)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.writeString(Paths.get(s"plans/r07/${n}_$suffix.txt"), txt)
        println(s"[plan] wrote plans/r07/${n}_$suffix.txt")
      } catch {
        case e: Throwable => println(s"[plan] $n FAILED: $e")
      }
    }
    spark.stop()
  }
}
