package graft.ir

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** File-corpus adapter: a tp2-style directory tree indexes identically to
  * the equivalent transcript table. */
class SourcesSpec extends SparkSpec {

  test("text-dir corpus == transcript-table corpus (tp2), depth-3 tree") {
    val dir = graft.SparkSpec.tmpDir("corpus")
    Files.createDirectories(Paths.get(dir, "sub", "subsub", "deep"))
    Fixtures.tp2.zipWithIndex.foreach { case ((_, terms), i) =>
      // spread over depths 1..4: the walk must be truly recursive (ADVICE
      // r1: the `**` glob silently dropped trees below two levels)
      val where = i match {
        case 0 => s"$dir/doc$i.txt"
        case 1 => s"$dir/sub/doc$i.txt"
        case 2 => s"$dir/sub/subsub/doc$i.txt"
        case _ => s"$dir/sub/subsub/deep/doc$i.txt"
      }
      Files.write(Paths.get(where),
        terms.mkString("\n").getBytes(StandardCharsets.UTF_8))
    }
    // a non-.txt file that must be skipped (reference extension filter)
    Files.write(Paths.get(s"$dir/readme.md"),
      "ignored noise".getBytes(StandardCharsets.UTF_8))

    val turns = Sources.fromTextDir(spark, dir)
    val view = IndexBuilder.build(spark, turns)
    assert(view.meta.docs == 4)
    val oracle = Oracle.index(Fixtures.tp2Corpus)
    // postings equivalence modulo docId permutation (path order != conv_id
    // order): compare by term → multiset of tfs and df
    val idToTerm = view.termDict.collect().map(t => t.term_id -> t.term).toMap
    val got = view.postings.collect().groupBy(_.term_id).map { case (tid, bs) =>
      idToTerm(tid) -> bs.flatMap(Codec.decodeBlock).map(_._2).sorted.toSeq
    }
    val want = oracle.postings.map { case (t, ps) => t -> ps.map(_._2).sorted.toSeq }
    assert(got == want)
    assert(view.termDict.collect().map(t => t.term -> t.df).toMap ==
      oracle.df.map { case (t, d) => t -> d.toLong })
  }

  test("paths with commas and glob metacharacters read verbatim (ADVICE r2)") {
    val dir = graft.SparkSpec.tmpDir("nasty-names")
    val names = Seq("plain.txt", "with,comma.txt", "curly{x}.txt",
      "brack[3].txt", "star*q.txt")
    names.zipWithIndex.foreach { case (n, i) =>
      Files.write(Paths.get(dir, n),
        s"token$i unique$i".getBytes(StandardCharsets.UTF_8))
    }
    val turns = Sources.fromTextDir(spark, dir).collect()
    // each file read exactly once, content intact — no comma-splitting, no
    // glob expansion, no silent drop
    assert(turns.length == names.length)
    assert(turns.map(_.getAs[String]("text")).sorted.toSeq ==
      names.indices.map(i => s"token$i unique$i").sorted)
  }
}
