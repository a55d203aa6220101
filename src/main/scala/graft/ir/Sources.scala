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

  /** Listed paths are verbatim file names, but Hadoop treats every input
    * path as a GLOB (ADVICE r2): `*?[]{}\` would expand/misparse. Backslash-
    * escape them (honored by Hadoop's GlobPattern). Literal commas need no
    * escape here — paths travel via the Path-varargs `setInputPaths`
    * (GraftCoreBridge), whose own escaping protects them from the
    * comma-split that the String overload applies. */
  private[ir] def escapePath(p: String): String =
    p.flatMap {
      case c @ ('*' | '?' | '[' | ']' | '{' | '}' | '\\') => s"\\$c"
      case c => c.toString
    }

  def fromTextDir(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.hadoop.fs.{Path => HPath}
    // explicit recursive FS walk: Hadoop's `**` glob is NOT recursive (it
    // behaves like `*`, silently skipping trees deeper than two levels —
    // ADVICE r1); the reference walks the whole tree (Collection.py:25-31).
    // Driver-side listing is O(files), the same cost the reference pays.
    val root = new HPath(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      val p = f.getPath.toUri.getPath
      // reference indexes only *.txt when the corpus mixes types; accept
      // extensionless files too (the tp2 fixture corpus has none)
      if (!p.contains("/.") && (!name.contains('.') || name.endsWith(".txt")))
        files += f.getPath.toString
    }
    if (files.isEmpty) return spark.emptyDataset[Turn].toDF()
    org.apache.spark.GraftCoreBridge.wholeTextFiles(
      spark.sparkContext, files.sorted.map(escapePath).toSeq,
      spark.sparkContext.defaultMinPartitions)
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
