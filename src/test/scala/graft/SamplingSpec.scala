package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.SamplingJobs

class SamplingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-sampling-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet").cache()

  test("thresholdHex encodes round(rate*256) as 2 lowercase hex chars") {
    assert(SamplingJobs.thresholdHex(0.0).contains("00"))
    assert(SamplingJobs.thresholdHex(0.10).contains("1a"))
    assert(SamplingJobs.thresholdHex(0.25).contains("40"))
    assert(SamplingJobs.thresholdHex(0.50).contains("80"))
    assert(SamplingJobs.thresholdHex(1.0).isEmpty)   // keep-all, no filter
    assert(SamplingJobs.thresholdHex(2.0).isEmpty)
    intercept[IllegalArgumentException](SamplingJobs.thresholdHex(-0.1))
  }

  test("stratified sample is deterministic, per-stratum, and rate-accurate") {
    val rates = Map("en" -> 0.10, "zh" -> 0.50)
    def run() = SamplingJobs.stratifiedSample(docs, col("doc_id"), col("lang"),
      rates, defaultRate = 0.25)

    // retry-stability: two runs pick byte-identical row sets
    val a = run().select("doc_id").collect().map(_.getLong(0)).sorted
    val b = run().select("doc_id").collect().map(_.getLong(0)).sorted
    assert(a.nonEmpty && a.sameElements(b), "hash sampling must be deterministic")

    // per-stratum rates land near target (md5 buckets are uniform; with
    // n~60-220 per stratum allow a generous binomial tolerance)
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = run().groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    totals.foreach { case (lang, n) =>
      val target = rates.getOrElse(lang, 0.25)
      val got = kept.getOrElse(lang, 0L).toDouble / n
      assert(math.abs(got - target) < 0.15,
        f"$lang: sampled $got%.3f of $n rows, target $target%.2f")
    }

    // a full-rate stratum keeps every row
    val all = SamplingJobs.stratifiedSample(docs, col("doc_id"), col("lang"),
      Map("en" -> 1.0), defaultRate = 1.0)
    assert(all.count() == docs.count())
  }

  test("the sample is a pure function of the key: same key set in, same rows out") {
    // reordering / repartitioning the input cannot change the decision —
    // this is what makes the sample safe under speculative retry at scale
    val base = SamplingJobs.stratifiedSample(docs, col("doc_id"), col("lang"),
      Map("en" -> 0.10), defaultRate = 0.25).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val shuffled = SamplingJobs.stratifiedSample(
      docs.repartition(13, col("source")), col("doc_id"), col("lang"),
      Map("en" -> 0.10), defaultRate = 0.25).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(base == shuffled)
  }

  test("hostQuota caps every host at k, deterministically and retry-stably") {
    val k = 3
    val capped = SamplingJobs.hostQuota(docs, col("source"), col("doc_id"), k)
    val bySource = capped.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val inputBySource = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every host capped at k; hosts under k keep everything
    inputBySource.foreach { case (s, n) =>
      assert(bySource(s) == math.min(n, k.toLong), s"host $s")
    }
    // rank audit: 1..count per host, no gaps
    val ranks = capped.groupBy("source")
      .agg(min("rk").as("mn"), max("rk").as("mx"), count(lit(1)).as("c"))
      .collect()
    ranks.foreach { r =>
      assert(r.getAs[Int]("mn") == 1 && r.getAs[Int]("mx").toLong == r.getAs[Long]("c"))
    }
    // deterministic under repartition (retry-stability)
    val a = capped.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = SamplingJobs.hostQuota(
      docs.repartition(13, col("lang")), col("source"), col("doc_id"), k)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("hostQuota two-phase top-k == the single-window rank on a 90%-one-host skew") {
    // the scale-shape differential: the bounded-aggregate form must pick
    // exactly the rows (and ranks) the per-host window rank picks, on a
    // fixture where one megahost owns 90% of the rows (the hot-partition
    // case the two-phase form exists for)
    import spark.implicits._
    val k = 7
    val rows = (0L until 2000L).map { i =>
      val host = if (i % 10 != 0) "megahost" else s"host${i % 97}"
      (i, host, s"payload$i")
    }
    val df = rows.toDF("doc_id", "host", "payload").repartition(8)
    val got = SamplingJobs.hostQuota(df, col("host"), col("doc_id"), k)
    // reference: the window form, stated inline
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("host"))
      .orderBy(md5(col("doc_id").cast("string").cast("binary")), col("doc_id"))
    val ref = df.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
    val gotRows = got.select("doc_id", "host", "payload", "rk")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3))).toSet
    val refRows = ref.select("doc_id", "host", "payload", "rk")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3))).toSet
    assert(gotRows == refRows)
    assert(gotRows.count(_._2 == "megahost") == k)

    // plan shape: the rank must come from a partial (map-side) topk_min
    // aggregate — bounded at k entries per host per map task — never from
    // a per-host window sort (the hot-partition shape)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("partial_topk_min"), plan)
    assert(!plan.toLowerCase.contains("window"), plan)
  }
}
