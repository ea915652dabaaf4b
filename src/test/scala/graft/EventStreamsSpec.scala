package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

class EventStreamsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-eventstreams-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // file stream sources require a directory — stage the table into one
  private lazy val eventsPath: String = {
    val dir = java.nio.file.Files.createTempDirectory("events-src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  test("watermarked windowed aggregation emits closed windows that match batch") {
    val q = EventStreams.startToMemory(
      EventStreams.windowedCounts(spark, eventsPath), "win_counts")
    q.awaitTermination()
    val streamed = spark.table("win_counts")
    assert(streamed.count() > 0, "no closed windows emitted")

    // closed windows must agree with a batch computation over the same data
    val batch = spark.read.parquet(eventsPath)
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))
    val joined = streamed.select("win_start", "event_type", "n")
      .join(batch.withColumnRenamed("n", "n_batch"), Seq("win_start", "event_type"))
    assert(joined.filter(col("n") =!= col("n_batch")).count() == 0)
  }

  test("flatMapGroupsWithState sessionization conserves per-user event counts") {
    import spark.implicits._
    val q = EventStreams.startToMemory(
      EventStreams.sessionize(spark, eventsPath).toDF(), "sessions")
    q.awaitTermination()
    val sessions = spark.table("sessions")
    assert(sessions.count() > 0)

    val perUserStream = sessions.groupBy("user_id")
      .agg(sum("n_events").as("n_stream"))
    val perUserBatch = spark.read.parquet(eventsPath)
      .groupBy("user_id").agg(count(lit(1)).as("n_batch"))
    val joined = perUserStream.join(perUserBatch, Seq("user_id"), "full_outer")
    assert(joined.filter(coalesce(col("n_stream"), lit(-1)) =!=
      coalesce(col("n_batch"), lit(-2))).count() == 0,
      "every user's events must be accounted for across closed+open sessions")
    // the 1-hour gap rule must actually close some sessions on this data
    assert(sessions.filter(col("closed")).count() > 0)
  }

  test("streaming exact dedup keeps one doc per fingerprint with bounded state") {
    // stage the docs table plus an exact-duplicate shard (the q_dedup_exact
    // scaffolding shape: every 5th doc re-lands under a shifted id)
    val dir = java.nio.file.Files.createTempDirectory("docs-dedup-src")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.write.mode("append").parquet(dir.toString)
    docs.filter(col("doc_id") % 5 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000)
      .write.mode("append").parquet(dir.toString)

    val q = graft.streaming.EventStreams.startToMemory(
      graft.streaming.EventStreams.streamingExactDedup(spark, dir.toString), "dedup_docs")
    q.awaitTermination()
    val out = spark.table("dedup_docs")

    val distinctFp = spark.read.parquet(dir.toString)
      .select(md5(lower(regexp_replace(col("text"), "\\s+", " "))).as("fp"))
      .distinct().count()
    assert(out.count() == distinctFp,
      s"stream must emit exactly one row per fingerprint (${out.count()} vs $distinctFp)")
    assert(out.select("fp").distinct().count() == distinctFp)
  }
}
