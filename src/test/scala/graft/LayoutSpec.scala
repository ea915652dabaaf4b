package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.extract.PageLayout
import graft.extract.PageLayout.Blk
import graft.pipeline.{LayoutJob, PageBlock}

/** PDF layout analysis: XY-cut reading order, blank-line segmentation,
  * furniture normalization, and the distributed header/footer removal +
  * reading-order job over the synthetic two-column corpus. */
class LayoutSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-layout-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("xyCut orders a clean two-column page left column first") {
    // two columns of two rows; idx encodes the expected reading order
    val blks = IndexedSeq(
      Blk(50, 60, 200, 100, 0), Blk(50, 180, 200, 100, 1),
      Blk(300, 60, 200, 100, 2), Blk(300, 180, 200, 100, 3))
    assert(PageLayout.xyCut(blks) == Seq(0, 1, 2, 3))
  }

  test("xyCut cuts the widest valley first: full-width banner then columns") {
    val blks = IndexedSeq(
      Blk(50, 10, 450, 30, 9),                     // banner spans both columns
      Blk(300, 60, 200, 100, 2), Blk(50, 60, 200, 100, 0),
      Blk(50, 180, 200, 100, 1), Blk(300, 180, 200, 100, 3))
    assert(PageLayout.xyCut(blks) == Seq(9, 0, 1, 2, 3))
  }

  test("xyCut nested: right column itself splits into two stacked cells") {
    val blks = IndexedSeq(
      Blk(50, 60, 200, 400, 0),                     // tall left column
      Blk(300, 60, 200, 100, 1), Blk(300, 400, 200, 100, 2))
    assert(PageLayout.xyCut(blks) == Seq(0, 1, 2))
  }

  test("xyCut falls back to (y, x) on overlapping blocks and terminates") {
    val blks = IndexedSeq(
      Blk(0, 0, 100, 100, 1), Blk(50, 50, 100, 100, 2), Blk(10, 0, 100, 100, 0))
    assert(PageLayout.xyCut(blks) == Seq(1, 0, 2))
    assert(PageLayout.xyCut(IndexedSeq.empty) == Nil)
    assert(PageLayout.xyCut(IndexedSeq(Blk(0, 0, 1, 1, 7))) == Seq(7))
  }

  test("segmentLines groups at blank lines") {
    assert(PageLayout.segmentLines(Seq("a", "b", "", "c", "  ", null, "d e")) ==
      Seq("a\nb", "c", "d e"))
    assert(PageLayout.segmentLines(Seq("", "  ")) == Nil)
  }

  test("normalizeFurniture: digits to #, case and whitespace folded") {
    assert(PageLayout.normalizeFurniture("Page 12 of 345") == "page # of #")
    assert(PageLayout.normalizeFurniture("  HCA   2024\n") == "hca #")
    assert(PageLayout.normalizeFurniture("A1B2") == "a#b#")
    assert(PageLayout.normalizeFurniture(null) == "")
  }

  test("furniture normalization: native expression equals the pure function") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lower, regexp_replace, trim}
    val rng = new scala.util.Random(7L)
    val alphabet = "aA1 #\t\n..页Z9-"
    val samples = Seq("Page 12 of 345", "  HCA   2024\n", "A1B2", "",
      "no digits here", "3 4 5", "tab\tsep 9", "12 34") ++
      (1 to 300).map { _ =>
        (0 until rng.nextInt(24)).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
      }
    val expr = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[0-9]+", "#"), "\\s+", " "))
    samples.toDF("text").select(col("text"), expr.as("e")).collect().foreach { r =>
      assert(r.getString(1) == PageLayout.normalizeFurniture(r.getString(0)),
        s"diverged on '${r.getString(0)}'")
    }
  }

  test("distributed job: furniture removed, reading order equals word order") {
    import spark.implicits._
    val text = (1 to 23).map(i => s"tok$i").mkString(" ")  // 23 words -> 3 pages
    val docs = Seq((5L, text), (6L, "only four words here")).toDF("doc_id", "text")
    val blocks = LayoutJob.synthesizeBlocks(spark, docs)
    // 23 content + 3 headers + 3 footers; doc 6: 4 content + 1 + 1
    assert(blocks.count() == (23 + 6) + (4 + 2))
    val kept = LayoutJob.removeFurniture(spark, blocks)
    assert(kept.filter(_.doc_id == 5L).count() == 23)
    assert(kept.filter(_.doc_id == 6L).count() == 4)
    val ordered = LayoutJob.readingOrder(spark, kept)
      .collect().groupBy(_.doc_id).map { case (id, bs) =>
        id -> bs.sortBy(b => (b.page, b.seq)).map(_.text).mkString(" ")
      }
    assert(ordered(5L) == text)
    assert(ordered(6L) == "only four words here")
  }

  test("furniture that repeats on only a minority of pages is kept") {
    import spark.implicits._
    // 3 pages; an in-band block on page 0 only (1 of 3 pages < half)
    val content = (0 until 30).map(i => PageBlock(1L, i / 10,
      50.0 + (i % 10) / 5 * 250.0, 60.0 + (i % 5) * 120.0, 200.0, 100.0, s"w$i"))
    val oneOff = PageBlock(1L, 0, 50.0, 10.0, 450.0, 30.0, "unique banner")
    val repeated = (0 until 3).map(p => PageBlock(1L, p, 50.0, 940.0, 450.0, 30.0, s"page ${p + 1}"))
    val blocks = spark.createDataset(content :+ oneOff :++ repeated)
    val kept = LayoutJob.removeFurniture(spark, blocks).collect().map(_.text).toSet
    assert(kept.contains("unique banner"))      // minority: kept
    assert(!kept.exists(_.startsWith("page "))) // repeated footer: removed
    assert(content.forall(b => kept.contains(b.text)))
  }

  // ---- published-rule invariants (round-3 verdict #8): the XY-cut output
  // must depend on page GEOMETRY only, never on the order blocks happen to
  // arrive from the upstream scan — on a cluster that order is a shuffle
  // artifact, so order-sensitivity would make reading order nondeterministic.

  private def randomPage(r: scala.util.Random): IndexedSeq[Blk] = {
    val n = 1 + r.nextInt(14)
    (0 until n).map { i =>
      // a mix of grid-ish and arbitrary placements so some pages cut cleanly,
      // some fall back — both paths must be order-independent
      if (r.nextBoolean())
        Blk(50.0 + r.nextInt(3) * 250.0, 60.0 + r.nextInt(5) * 120.0,
          200.0, 100.0, i)
      else
        Blk(r.nextDouble() * 500.0, r.nextDouble() * 800.0,
          10.0 + r.nextDouble() * 300.0, 10.0 + r.nextDouble() * 200.0, i)
    }
  }

  test("property: xyCut is invariant to block input order (500 seeded pages)") {
    val r = new scala.util.Random(20260417L)
    for (_ <- 1 to 500) {
      val page = randomPage(r)
      val expect = PageLayout.xyCut(page)
      val shuffled = r.shuffle(page)
      assert(PageLayout.xyCut(shuffled) == expect,
        s"reading order changed under input permutation: $page vs $shuffled")
    }
  }

  test("property: xyCut emits every block exactly once (no drop, no dup)") {
    val r = new scala.util.Random(20260418L)
    for (_ <- 1 to 500) {
      val page = randomPage(r)
      val order = PageLayout.xyCut(page)
      assert(order.sorted == page.map(_.idx).sorted,
        s"xyCut lost or duplicated blocks on $page -> $order")
    }
  }
}
