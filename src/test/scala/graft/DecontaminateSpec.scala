package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Decontaminate

/** Test-set decontamination: shingle overlap detection, per-doc shingle
  * dedup, the document-frequency cap, and test-split exclusion. */
class DecontaminateSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-decontam-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import org.apache.spark.sql.functions.col

  test("shingles are per-doc distinct and need k tokens") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c a b c a b c"),     // windows repeat: a b c a / b c a b / ...
      (2L, "x y z"),                 // only 3 tokens: no 4-shingle
      (3L, "")
    ).toDF("doc_id", "text")
    val sh = Decontaminate.shingles(docs, 4).collect()
    assert(!sh.exists(_.getLong(0) == 2L) && !sh.exists(_.getLong(0) == 3L))
    val doc1 = sh.filter(_.getLong(0) == 1L).map(_.getString(1))
    assert(doc1.length == doc1.distinct.length)
    assert(doc1.length == 3)  // a-b-c-a / b-c-a-b / c-a-b-a? no: 3 distinct of 6 windows
  }

  test("a training doc sharing a 4-shingle with a test doc is flagged; others are not") {
    import spark.implicits._
    val docs = Seq(
      (0L, "held out test sequence words tail one"),          // test split (0 % 97 == 0)
      (5L, "prefix held out test sequence suffix"),           // shares "held out test sequence"
      (6L, "completely different training content here now")  // clean
    ).toDF("doc_id", "text")
    val hit = Decontaminate.contaminated(docs, 4, 97L, 50L).collect()
    assert(hit.map(_.getLong(0)).toSet == Set(5L))
    val r = hit.head
    assert(r.getLong(1) == 1 && r.getLong(2) == 1)
  }

  test("the DF cap silences ubiquitous shingles") {
    import spark.implicits._
    val common = "the same four tokens"
    val docs = ((0L, common) +: (1L to 5L).map(i => (i, s"$common plus doc$i filler")))
      .toDF("doc_id", "text")
    // shingle "the same four tokens" appears in all 5 training docs
    val loose = Decontaminate.contaminated(docs, 4, 97L, 50L).collect()
    assert(loose.length == 5)
    val capped = Decontaminate.contaminated(docs, 4, 97L, 4L).collect()
    // df=5 > cap=4: the only shared shingle is dropped -> nothing flagged
    assert(capped.forall(_.getLong(1) == 0) || capped.isEmpty)
  }

  test("test docs never flag themselves or each other") {
    import spark.implicits._
    val docs = Seq(
      (0L, "shared quad of tokens alpha"),
      (97L, "shared quad of tokens beta")
    ).toDF("doc_id", "text")
    assert(Decontaminate.contaminated(docs, 4, 97L, 50L).collect().isEmpty)
  }

  test("audit names the test doc and counts the shared shingles per pair") {
    import spark.implicits._
    val docs = Seq(
      (0L, "held out test sequence words tail one"),   // test doc A
      (97L * 2, "another probe quad entirely separate"), // test doc B
      // shares "held out test sequence" with A AND "another probe quad
      // entirely" with B; two distinct shingles with A via the longer run
      (5L, "held out test sequence words then another probe quad entirely"),
      (6L, "clean training content with no overlap at all")
    ).toDF("doc_id", "text")
    val audit = Decontaminate.contaminationAudit(docs, 4, 97L, 50L)
      .orderBy(col("doc_id"), col("test_doc_id")).collect()
    assert(audit.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((5L, 0L), (5L, 194L)))
    val vsA = audit.find(_.getLong(1) == 0L).get
    // "held out test sequence" + "out test sequence words" = 2 shared
    assert(vsA.getLong(2) == 2, s"expected 2 shared shingles vs doc 0, got $vsA")
    assert(vsA.getString(3).nonEmpty)
    // grouping the audit by doc reproduces `contaminated`'s doc set
    val fromAudit = audit.map(_.getLong(0)).toSet
    val flagged = Decontaminate.contaminated(docs, 4, 97L, 50L)
      .collect().map(_.getLong(0)).toSet
    assert(fromAudit == flagged)
  }

  test("plan: equi-joins only, no cartesian") {
    import spark.implicits._
    val docs = Seq((0L, "a b c d e"), (1L, "a b c d f")).toDF("doc_id", "text")
    val p = Decontaminate.contaminated(docs, 4, 97L, 50L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }
}
