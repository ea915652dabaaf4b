package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.LmQuality

/** CCNet-style trigram-LM perplexity bucketing: trigram extraction
  * edges, add-1/2 probability mass (observed mass sums to exactly 1),
  * gibberish-lands-in-tail / common-text-lands-in-head discrimination,
  * per-language tercile sizes, determinism, the no-trigram drop
  * contract, and the broadcast shape of the scoring join. */
class LmQualitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-lm-quality-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang")
  }

  test("trigram extraction: edges and overlap") {
    import spark.implicits._
    val got = Seq("", "ab", "abc", "abcd", "a  B c")
      .toDF("nt").select(LmQuality.trigramList(col("nt")).as("t"))
      .collect().map(_.getSeq[String](0).toList)
    assert(got(0) == Nil)
    assert(got(1) == Nil)
    assert(got(2) == List("abc"))
    assert(got(3) == List("abc", "bcd"))
    assert(got(4).length == 4) // len 6 → 4 overlapping trigrams
  }

  test("observed probability mass sums to exactly 1 per language") {
    val d = docs(Seq(
      (1L, "the cat sat on the mat", "en"),
      (2L, "the dog sat on the log", "en"),
      (3L, "le chat est sur le tapis", "fr")))
    val (model, _) = LmQuality.trainTrigramModel(d)
    val mass = model
      .groupBy("lang")
      .agg(sum(pow(lit(10.0), col("logp_e9").cast("double") / 1e9)).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(mass("en") - 1.0) < 1e-6)
    assert(math.abs(mass("fr") - 1.0) < 1e-6)
  }

  test("gibberish lands in tail, common text in head, per language") {
    val common = "the quick brown fox jumps over the lazy dog and runs home"
    val rows = (0L until 11L).map(i => (i, common + " again " + common, "en")) :+
      (11L, "zqxj vwkq jzzx qqvw kxzj wqqz xjzv", "en")
    val out = LmQuality.perplexityBuckets(docs(rows))
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(out(11L) == "tail") // rare trigrams → lowest likelihood
    assert(out(0L) == "head") // the common docs fill head first
    // tercile sizes over 12 docs: 4/4/4
    val sizes = out.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(sizes == Map("head" -> 4, "middle" -> 4, "tail" -> 4))
  }

  test("languages bucket independently") {
    val rows = (0L until 6L).map(i => (i, s"shared english text body $i", "en")) ++
      (6L until 12L).map(i => (i, s"texte partagé corps $i", "fr"))
    val out = LmQuality.perplexityBuckets(docs(rows))
      .groupBy("lang", "bucket").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    for (l <- Seq("en", "fr"); b <- Seq("head", "middle", "tail"))
      assert(out((l, b)) == 2, s"$l/$b")
  }

  test("docs with no trigrams drop out; scoring is deterministic") {
    val d = docs(Seq((1L, "a", "en"), (2L, "solid body of text here", "en"),
      (3L, "another solid body of text", "en"), (4L, "third solid body text", "en")))
    val a = LmQuality.perplexityBuckets(d).orderBy("doc_id").collect()
    val b = LmQuality.perplexityBuckets(d).orderBy("doc_id").collect()
    assert(a.map(_.getLong(0)).toList == List(2L, 3L, 4L)) // doc 1 has no trigrams
    assert(a.map(_.toString).toList == b.map(_.toString).toList)
  }

  test("the scoring join broadcasts the model (no wide exchange on trigrams)") {
    val d = docs((0L until 20L).map(i => (i, s"body of text number $i with words", "en")))
    val plan = LmQuality.perplexityBuckets(d).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }
}
