package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Decontaminate, DedupJobs}

/** Adversarial hot-key behavior of the shingle equi-joins (round-3 verdict
  * #6): the 100-TB skew story for the dedup/decontamination family rests on
  * DOCUMENT-FREQUENCY caps (every shingle key that survives to a join
  * carries at most dfCap/maxDf rows — a bound independent of corpus size)
  * with AQE skew-join as the backstop for residual imbalance BELOW the cap.
  *
  * AQE's skew split activates when a post-shuffle partition exceeds both
  * `spark.sql.adaptive.skewJoin.skewedPartitionFactor` (default 5.0 x the
  * median) and `skewedPartitionThresholdInBytes` (default 256 MB) — far
  * above anything a unit test can build, which is exactly the point: the
  * caps keep every bucket orders of magnitude under the threshold, so the
  * backstop should never need to fire. This spec therefore asserts the cap
  * bound directly on an adversarial corpus (one language, 90% of documents
  * sharing one phrase) and pins that the AQE backstop is enabled.
  */
class SkewSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-skew-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** 60 one-language docs; 54 (90%) contain the same hot phrase plus a
    * per-doc unique tail, 6 are pairwise DISJOINT (single-letter bodies, a
    * different letter each — they must share no shingle with each other or
    * with the hot phrase, or they'd form their own below-cap near-dup
    * cluster and this spec would no longer isolate the hot bucket). */
  private def hotCorpus = {
    import spark.implicits._
    val hot = "the quick brown fox jumps over the lazy dog again and again"
    (0 until 60).map { i =>
      val text = if (i % 10 == 5) {
        val c = ('g' + i / 10).toChar.toString
        s"${c * 3} ${c * 4} ${c * 2} ${c * 5} ${c * 3}"
      } else f"$hot q$i%03dw"
      (i.toLong, "en", text)
    }.toDF("doc_id", "lang", "text")
  }

  test("ngram DF cap bounds the hottest join key on a 90%-hot corpus") {
    val docs = hotCorpus
    val dfCap = 20
    // Replicate the pipeline's shingle keying to measure the bucket sizes
    // it would join on: raw df of the hot trigrams is ~54 (the adversarial
    // bucket); every key the cap lets THROUGH carries <= dfCap rows.
    val nt = lower(regexp_replace(col("text"), "\\s+", " "))
    val tri = docs.withColumn("nt", nt)
      .select(col("doc_id"), col("lang"),
        explode(array_distinct(transform(
          sequence(lit(1), greatest(length(col("nt")) - 2, lit(1))),
          i => col("nt").substr(i, lit(3))))).as("g"))
    val dfreq = tri.groupBy("lang", "g").agg(count(lit(1)).as("df"))
    val rawMax = dfreq.agg(max("df")).head.getLong(0)
    assert(rawMax >= 54, s"precondition: the hot trigrams must dominate, got max df $rawMax")
    val keptMax = dfreq.filter(col("df") <= dfCap).agg(max("df")).head.getLong(0)
    assert(keptMax <= dfCap, s"a surviving join key carries $keptMax > $dfCap rows")

    // End-to-end: capped, the hot phrase contributes nothing — no pair
    // reaches the 0.6 Jaccard threshold; uncapped semantics would emit
    // every hot pair (54*53/2 = 1431), the quadratic bucket the cap exists
    // to prevent.
    val capped = DedupJobs.ngramJaccardCapped(docs, n = 3, dfCap = dfCap, threshold = 0.6)
    assert(capped.count() == 0, "capped join must drop the universal-phrase pairs")
    DedupJobs.releaseCached()
    val uncapped = DedupJobs.ngramJaccardCapped(docs, n = 3, dfCap = 100000, threshold = 0.6)
    assert(uncapped.count() == 1431L, "uncapped, the hot bucket is quadratic")
    DedupJobs.releaseCached()
  }

  test("decontamination maxDf bounds the hot shingle and keeps the join equi") {
    val docs = hotCorpus // doc 0 (0 % 97 == 0) is the test split and is 90%-hot
    val hit = Decontaminate.contaminated(docs, k = 4, testMod = 97L, maxDf = 10L)
    assert(hit.count() == 0,
      "the universal shingle (df ~53 > 10) must be excluded from the overlap join")
    val unbounded = Decontaminate.contaminated(docs, k = 4, testMod = 97L, maxDf = 100000L)
    assert(unbounded.count() == 53,
      "without the cap every hot training doc joins the hot test doc")
    val p = unbounded.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"decontamination must stay an equi-join:\n$p")
  }

  test("AQE skew-join backstop is enabled with its documented activation thresholds") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
    val factor = spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionFactor").toDouble
    assert(factor > 1.0, s"skew factor must be a real multiple of the median, got $factor")
    // threshold is a byte size like "256MB" — parse loosely, assert positive
    val thr = spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
    assert(thr.nonEmpty)
  }
}
