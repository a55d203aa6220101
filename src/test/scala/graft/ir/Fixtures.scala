package graft.ir

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Deterministic test inputs (FIXTURES.md). No external data, no wall-clock,
 * no java.util.Random default seeding — a splittable counter PRNG keyed on
 * (seed, conv, turn, slot) so fixtures are identical at any parallelism.
 */
object Fixtures {

  private val Epoch = 1577836800000L // 2020-01-01T00:00:00Z

  /** The reference's 4-doc lecture corpus
    * (`/root/reference/IR_server/Resources/Corpus/tp2_2/doc1..doc4`, one term
    * per line) embedded as 4 single-conversation transcripts, one turn per
    * source line (FIXTURES.md §2). */
  val tp2: Seq[(String, Seq[String])] = Seq(
    "c0001" -> Seq("software", "libre", "papel", "fundamental", "crecimiento",
      "software", "internet", "favorecido", "comunicacion", "desarrolladores",
      "internet"),
    "c0002" -> Seq("libre", "riqueza", "pais", "cultura"),
    "c0003" -> Seq("software", "fundamental", "comunicacion", "pais",
      "produccion", "produccion", "tecnologia", "hardware"),
    "c0004" -> Seq("software", "libre", "fundamental", "crecimiento", "pais",
      "cultura", "incorpore", "estado", "software", "libre"))

  /** The 13 reference bot queries
    * (`/root/reference/IR_client/src/View/InitClient.java:124-138`). */
  val referenceQueries: Seq[String] = Seq(
    "primera consulta",
    "universidad riqueza atletismo argentina estado nacion edificio comunicacion",
    "tecnologia",
    "pais",
    "estado libre",
    "pais libre",
    "perro libre finanzas religion estado morfologia",
    "tecnologia libre",
    "ultima consulta",
    "pais libre",
    "estado libre",
    "tecnologia",
    "pais")

  def tp2Corpus: Seq[(String, String)] = tp2.map { case (c, ts) => c -> ts.mkString(" ") }

  def tp2Turns(spark: SparkSession): DataFrame = {
    import spark.implicits._
    tp2.flatMap { case (conv, terms) =>
      terms.zipWithIndex.map { case (term, i) =>
        Turn(conv, i, "user", term, null, new Timestamp(Epoch + i * 60000L))
      }
    }.toDF()
  }

  // ---- splittable counter PRNG (SplitMix64 over a mixed key) ----
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  private def rand(seed: Long, a: Long, b: Long, c: Long): Long =
    mix(mix(mix(seed) ^ a * 0x100000001B3L) ^ b * 0x9E3779B1L) ^ mix(c)

  /** Zipf-ish vocabulary: the 20 tp2 content terms are the hottest (hot-term
    * skew for salting tests, and the reference query set stays non-empty),
    * then synth terms. */
  private val tp2Vocab: Vector[String] = tp2.flatMap(_._2).distinct.toVector
  private val vocabSize = 2000
  private def vocabTerm(r: Int): String =
    if (r < tp2Vocab.length) tp2Vocab(r) else f"term${r}%04d"

  /** Zipf(s≈1.1) rank sample from a uniform u in [0,1). */
  private def zipfRank(u: Double): Int = {
    // inverse-CDF approximation for s=1.1 over [1, vocabSize]
    val s = 1.1
    val n = vocabSize.toDouble
    val r = math.pow(u * (math.pow(n, 1 - s) - 1) + 1, 1 / (1 - s))
    math.min(vocabSize - 1, math.max(0, r.toInt - 1))
  }

  private val accentVariants = Map(
    "pais" -> "País,", "libre" -> "¡LIBRE!", "cultura" -> "cultúra",
    "estado" -> "Estado.", "tecnologia" -> "tecnología")

  /** Deterministic synthetic transcript table (FIXTURES.md §4). */
  def synthTurns(spark: SparkSession, nConvs: Int, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val rows = spark.sparkContext
      .parallelize(0 until nConvs, math.max(1, nConvs / 500))
      .flatMap { ci =>
        val conv = f"c$ci%08d"
        val nTurns = 1 + (rand(seed, ci, 0, 0) & 0x7FFFFFFF).toInt % 12
        (0 until nTurns).map { ti =>
          val nTok = 5 + (rand(seed, ci, ti, 1) & 0x7FFFFFFF).toInt % 36
          val toks = (0 until nTok).map { wi =>
            val u = ((rand(seed, ci, ti, 100L + wi) >>> 11).toDouble / (1L << 53).toDouble)
            val base = vocabTerm(zipfRank(u))
            val v = (rand(seed, ci, ti, 500L + wi) & 0x7FFFFFFF).toInt % 100
            if (v < 5) accentVariants.getOrElse(base, base.toUpperCase)
            else if (v < 7) "de" // stopword injection
            else if (v < 8) "xy" // length outlier (dropped by minLen=3)
            else base
          }
          val role = if ((rand(seed, ci, ti, 2) & 0x7FFFFFFF) % 10 == 0) "tool"
            else if (ti % 2 == 0) "user" else "assistant"
          val tool = if (role == "tool") "search" else null
          Turn(conv, ti, role, toks.mkString(" "), tool,
            new Timestamp(Epoch + (ci.toLong % 100000) * 1000 + ti))
        }
      }
    spark.createDataFrame(rows)
  }

  /** Oracle-side corpus matching synthTurns: conv → concatenated text. */
  def synthCorpus(spark: SparkSession, nConvs: Int, seed: Long = 42L): Seq[(String, String)] = {
    import org.apache.spark.sql.functions._
    IndexBuilder.assembleDocs(synthTurns(spark, nConvs, seed))
      .orderBy("conv_id")
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toSeq
  }
}
