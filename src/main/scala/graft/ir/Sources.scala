package graft.ir

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Corpus sources. The engine's primary input is the transcript table
 * (BASELINE.json input_hint); this adapter reproduces the reference's
 * filesystem corpus (S1–S3: recursive directory walk, `.txt`-only filter,
 * UTF-8 line reader — `modulos/Collection.py:25-31`, `modulos/Indexer.py:
 * 40-42,53-63`) as that table: one file = one conversation, one line = one
 * turn, docId order = relative-path order (the reference assigns docIds in
 * walk order; we use the deterministic path sort the engine's dense-id
 * assignment needs).
 *
 * Implementation: `wholeTextFiles` — the reference's corpora are
 * many-small-files trees, which is exactly the case Spark's text line reader
 * mis-serves (no stable line order across splits) and wholeTextFiles serves
 * well (one record per file, order intact). A 100 TB corpus would arrive as
 * a table, not a million tiny files.
 */
object Sources {

  private val Epoch = 1577836800000L

  def fromTextDir(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.wholeTextFiles(s"$dir/**")
      .filter { case (path, _) => !path.contains("/.") } // dotfiles
      .filter { case (path, _) =>
        // reference indexes only *.txt when the corpus mixes types; accept
        // extensionless files too (the tp2 fixture corpus has none)
        val name = path.substring(path.lastIndexOf('/') + 1)
        !name.contains('.') || name.endsWith(".txt")
      }
      .flatMap { case (path, content) =>
        val conv = path
        content.split("\r?\n", -1).iterator.zipWithIndex
          .filter(_._1.nonEmpty)
          .map { case (line, i) =>
            Turn(conv, i, "user", line, null, new Timestamp(Epoch + i * 1000L))
          }
      }
      .toDF()
  }
}
