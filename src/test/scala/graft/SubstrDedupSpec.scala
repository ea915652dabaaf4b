package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.SubstrDedup

/** Exact-substring dedup (ExactSubstr, Lee et al. 2022): cross-doc
  * removal with the documented window semantics, self-repeat exclusion,
  * interval-merge correctness at boundaries, totality, and a
  * differential check against an independent per-char-mask reference
  * implementation on a randomized corpus. */
class SubstrDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-substr-dedup-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val W = 20 // small window keeps fixtures readable

  private def run(rows: Seq[(Long, String)]): Map[Long, (Long, String)] = {
    import spark.implicits._
    SubstrDedup.dedupText(rows.toDF("doc_id", "text"), W)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
  }

  /** Independent reference: brute-force per-char mask, the oracle's
    * formulation, driver-side. */
  private def reference(rows: Seq[(Long, String)]): Map[Long, (Long, String)] = {
    val wins = rows.flatMap { case (id, t0) =>
      val t = Option(t0).getOrElse("")
      (0 to t.length - W).map(i => (id, i, t.substring(i, i + W)))
    }
    val dup = wins.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2).keySet
    val cov = wins.filter(w => dup.contains(w._3)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    rows.map { case (id, t0) =>
      val t = Option(t0).getOrElse("")
      val c = cov.getOrElse(id, Set.empty)
      val covered = (j: Int) => c.exists(p => p <= j && j < p + W)
      id -> ((c.size.toLong, t.indices.filterNot(covered).map(t.charAt).mkString))
    }.toMap
  }

  test("a shared passage is removed from every doc carrying it; unique text survives") {
    val banner = "COMMON LICENSE BANNER TEXT HERE PADPADPAD" // 41 chars > W
    val rows = Seq(
      (1L, s"alpha unique prefix one $banner alpha tail x"),
      (2L, s"beta other prefix two $banner beta tail yy"),
      (3L, "gamma entirely unique document body with no shared spans at all"))
    val got = run(rows)
    assert(got == reference(rows))
    assert(!got(1L)._2.contains("BANNER"))
    assert(!got(2L)._2.contains("BANNER"))
    assert(got(3L) == ((0L, rows(2)._2)))
    // survivors keep their unique prefixes
    assert(got(1L)._2.startsWith("alpha unique prefix"))
    assert(got(2L)._2.startsWith("beta other prefix"))
  }

  test("self-repeats within one doc do not count as duplication") {
    val rep = "SELFREPEATEDSPANXYZ!" // exactly W chars
    assert(rep.length == W)
    val rows = Seq(
      (1L, s"$rep middle filler $rep"),
      (2L, "completely different other doc body text"))
    val got = run(rows)
    assert(got == reference(rows))
    assert(got(1L)._1 == 0L) // nothing covered
    assert(got(1L)._2 == rows.head._2)
  }

  test("exactly-W shared span removes exactly its chars; boundaries are tight") {
    val span = "0123456789ABCDEFGHIJ"
    assert(span.length == W)
    val rows = Seq(
      (1L, s"L$span R"),
      (2L, s"xx$span"), // span at the very end: tail handling
      (3L, "zz unrelated other content body"))
    val got = run(rows)
    assert(got == reference(rows))
    assert(got(1L) == ((1L, "L R")))
    assert(got(2L) == ((1L, "xx")))
  }

  test("short docs, empty docs, and null text pass through verbatim") {
    import spark.implicits._
    val df = Seq((1L, "tiny"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = SubstrDedup.dedupText(df, W)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got(1L) == ((0L, "tiny")))
    assert(got(2L) == ((0L, "")))
    assert(got(3L) == ((0L, ""))) // null normalizes to empty
  }

  test("differential vs the per-char-mask reference on a randomized corpus") {
    // seeded corpus over a tiny alphabet so cross-doc window collisions
    // actually happen, including overlapping and chained intervals
    val rnd = new scala.util.Random(42)
    val frags = Vector.fill(8)((0 until (W + rnd.nextInt(15)))
      .map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
    val rows = (0L until 24L).map { i =>
      val n = 2 + rnd.nextInt(4)
      i -> (0 until n).map(_ => frags(rnd.nextInt(frags.size))).mkString(" ")
    }.map { case (i, t) => (i, t) }
    val got = run(rows)
    val want = reference(rows)
    assert(got.keySet == want.keySet)
    rows.foreach { case (id, _) => assert(got(id) == want(id), s"doc $id") }
  }

  test("audit projection agrees with the rewrite") {
    import spark.implicits._
    val banner = "SHARED BANNER ACROSS DOCS PAD PAD" + " PAD"
    val rows = Seq((1L, s"one $banner"), (2L, s"two $banner"), (3L, "three unique"))
    val df = rows.toDF("doc_id", "text")
    val full = SubstrDedup.dedupText(df, W)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val audit = SubstrDedup.audit(df, W)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getLong(3))).toList
    audit.foreach { case (id, md5Got, nKept) =>
      val kept = full(id)
      assert(nKept == kept.length.toLong)
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(kept.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(md5Got == md, s"doc $id")
    }
  }
}
