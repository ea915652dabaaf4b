package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.LineDedup

/** CCNet-style cross-corpus line dedup: hand-pinned removal cases plus a
  * differential against an independent driver-side implementation of the
  * declared semantics on a seeded random corpus. */
class LineDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-linededup-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def run(docs: Seq[(Long, String)], minDocs: Int): Map[Long, (Long, Long, String)] = {
    import spark.implicits._
    LineDedup.dedupLines(docs.toDF("doc_id", "text"), minDocs)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
  }

  /** The declared semantics, independently: normalize, count distinct
    * docs per key, strip lines at >= minDocs, rejoin in order. */
  private def ref(docs: Seq[(Long, String)], minDocs: Int): Map[Long, (Long, Long, String)] = {
    def key(line: String): String =
      line.replaceAll("\\s+", " ").trim.toLowerCase
    val counts = docs
      .flatMap { case (id, t) => t.split("\n", -1).map(l => (key(l), id)) }
      .distinct.groupBy(_._1).map { case (k, v) => k -> v.size }
    docs.map { case (id, t) =>
      val lines = t.split("\n", -1)
      val (kept, removed) = lines.partition(l => counts(key(l)) < minDocs)
      id -> ((kept.length.toLong, removed.length.toLong, kept.mkString("\n")))
    }.toMap
  }

  test("boilerplate lines strip everywhere; unique lines keep order") {
    val docs = Seq(
      1L -> "COPYRIGHT 2024\nalpha body\nSubscribe now\nbeta body",
      2L -> "copyright   2024\ngamma\nSubscribe now",
      3L -> "delta\nCopyright 2024\nepsilon")
    val out = run(docs, 2)
    // "copyright 2024" (case/ws-insensitive) and "Subscribe now" are hot
    assert(out(1L) == ((2L, 2L, "alpha body\nbeta body")))
    assert(out(2L) == ((1L, 2L, "gamma")))
    assert(out(3L) == ((2L, 1L, "delta\nepsilon")))
  }

  test("document with every line hot reduces to the empty string") {
    val docs = Seq(1L -> "same\nsame", 2L -> "same", 3L -> "same\nother")
    val out = run(docs, 2)
    assert(out(1L) == ((0L, 2L, "")))
    assert(out(3L) == ((1L, 1L, "other")))
  }

  test("threshold counts distinct docs, not occurrences") {
    // "x" appears 3 times but only in one doc: must survive at minDocs=2
    val docs = Seq(1L -> "x\nx\nx", 2L -> "y")
    val out = run(docs, 2)
    assert(out(1L) == ((3L, 0L, "x\nx\nx")))
  }

  test("null-safe: null text behaves as one empty line") {
    import spark.implicits._
    val df = Seq((1L, null: String), (2L, ""), (3L, "a")).toDF("doc_id", "text")
    val out = LineDedup.dedupLines(df, 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // the empty line's key appears in docs 1 and 2 -> hot at minDocs=2
    assert(out(1L) == ((0L, 1L, "")))
    assert(out(2L) == ((0L, 1L, "")))
    assert(out(3L) == ((1L, 0L, "a")))
  }

  test("differential vs independent implementation on a seeded corpus") {
    val rnd = new scala.util.Random(4242)
    val vocabulary = Vector("alpha", "beta", "gamma", "delta", "footer line",
      "  Footer   LINE ", "(c) site", "body " * 3)
    val docs = (1L to 60L).map { id =>
      val nLines = 1 + rnd.nextInt(6)
      val lines = Seq.fill(nLines)(
        if (rnd.nextBoolean()) vocabulary(rnd.nextInt(vocabulary.size))
        else s"unique ${rnd.nextLong()}")
      id -> lines.mkString("\n")
    }
    for (minDocs <- Seq(2, 5, 10))
      assert(run(docs, minDocs) == ref(docs, minDocs), s"minDocs=$minDocs")
  }
}
