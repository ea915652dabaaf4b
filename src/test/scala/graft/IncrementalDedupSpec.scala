package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.DedupJobs

/** Incremental dedup against a persisted signature index: the probe must
  * agree EXACTLY with a batch minhashVerified over (corpus ∪ snapshot)
  * restricted to cross pairs — including the combined-size bucket cap —
  * while never re-signaturing the corpus. */
class IncrementalDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-incdedup-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def pairSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def freshIndex(corpus: DataFrame, numHashes: Int, bands: Int): String = {
    val d = Files.createTempDirectory("inc_dedup_idx").toString
    DedupJobs.buildMinhashIndex(corpus, d, numHashes, bands)
    d
  }

  test("probe == batch-over-union cross pairs on the synthetic corpus") {
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val snapshot = corpus.filter(col("doc_id") % 7 === 3)
      .withColumn("doc_id", col("doc_id") + lit(1000000L))

    val idx = freshIndex(corpus, numHashes = 8, bands = 4)
    val inc = pairSet(DedupJobs.dedupAgainstIndex(spark, idx, snapshot, corpus,
      bucketCap = 200, jaccardThreshold = 0.5))

    val batch = pairSet(DedupJobs.minhashVerifiedPairs(
        corpus.unionByName(snapshot), numHashes = 8, bands = 4,
        bucketCap = 200, jaccardThreshold = 0.5)
      .filter(col("doc_a") < 1000000L && col("doc_b") >= 1000000L))

    assert(inc.nonEmpty, "expected re-crawled docs to match their originals")
    assert(inc == batch,
      s"incremental vs batch-union diverged: only-inc=${(inc -- batch).take(5)} " +
        s"only-batch=${(batch -- inc).take(5)}")
    // every re-crawled doc is an exact copy of its original → the identity
    // pair is present at jaccard 1.0 (unless its bucket is capped, which
    // the batch differential above already adjudicates)
    val identity = inc.filter { case (a, b, _) => b - a == 1000000L }
    assert(identity.nonEmpty && identity.forall(_._3 == 1.0))
  }

  test("non-default parameters are read from the index meta, not restated") {
    import spark.implicits._
    val corpus = (0L until 40L).map { i =>
      val base = s"shared prefix tokens alpha beta gamma delta epsilon doc$i"
      (i, if (i % 2 == 0) base else s"$base zeta eta theta")
    }.toDF("doc_id", "text")
    val snapshot = corpus.filter(col("doc_id") < 10)
      .withColumn("doc_id", col("doc_id") + lit(5000L))

    val idx = freshIndex(corpus, numHashes = 4, bands = 2)
    // probe states no signature params — a mismatched re-signature is
    // impossible by construction
    val inc = pairSet(DedupJobs.dedupAgainstIndex(spark, idx, snapshot, corpus,
      bucketCap = 500, jaccardThreshold = 0.3))
    val batch = pairSet(DedupJobs.minhashVerifiedPairs(
        corpus.unionByName(snapshot), numHashes = 4, bands = 2,
        bucketCap = 500, jaccardThreshold = 0.3)
      .filter(col("doc_a") < 5000L && col("doc_b") >= 5000L))
    assert(inc == batch)
    assert(inc.nonEmpty)
  }

  test("bucket cap is COMBINED: new arrivals can push an index bucket over it") {
    import spark.implicits._
    val text = "identical body tokens quartz zebra xylophone marble onyx"
    val corpus = (1L to 3L).map(i => (i, text)).toDF("doc_id", "text")
    val snap1 = Seq((100L, text)).toDF("doc_id", "text")

    // cap 4: 3 indexed + 1 new = 4 ≤ cap → all 3 cross pairs verify at 1.0
    val idx = freshIndex(corpus, numHashes = 8, bands = 4)
    val under = pairSet(DedupJobs.dedupAgainstIndex(spark, idx, snap1, corpus,
      bucketCap = 4, jaccardThreshold = 0.5))
    assert(under == Set((1L, 100L, 1.0), (2L, 100L, 1.0), (3L, 100L, 1.0)))

    // cap 3: the same probe now overflows every shared bucket (3 + 1 > 3)
    // → zero pairs, exactly as a batch re-run over the union would decide
    val over = pairSet(DedupJobs.dedupAgainstIndex(spark, idx, snap1, corpus,
      bucketCap = 3, jaccardThreshold = 0.5))
    assert(over.isEmpty)
  }

  test("zero-token and novel snapshot docs yield no pairs; stream is typed") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "completely different indexed content here")).toDF("doc_id", "text")
    val snapshot = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"), // near-dup of 1
      (11L, "!!! ??? ..."),                         // zero tokens
      (12L, "novel never seen before payload")      // no shared bucket
    ).toDF("doc_id", "text")
    val idx = freshIndex(corpus, numHashes = 8, bands = 4)
    val got = pairSet(DedupJobs.dedupAgainstIndex(spark, idx, snapshot, corpus,
      bucketCap = 200, jaccardThreshold = 0.5))
    assert(got == Set((1L, 10L, 1.0)))
  }
}
