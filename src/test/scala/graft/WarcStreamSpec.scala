package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.WarcJob
import graft.streaming.WarcStream

class WarcStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-warcstream-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docsDF(ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"body of document $i with some text", "en", s"src${i % 3}"))
      .toDF("doc_id", "text", "lang", "source")
  }

  /** Encode `ids` into real `.warc.gz` shard files under `dir`, with a
    * distinct name prefix per call (the landing-directory arrival model).
    * Returns the number of shard files written (the encoder's partitioning
    * is its own business — ScanParallelism may widen it). */
  private def dropShards(dir: Path, ids: Range, tag: String): Int = {
    val shards = WarcJob.encodePartitions(docsDF(ids).repartition(2)).collect()
    shards.zipWithIndex.foreach { case ((_, bytes), i) =>
      Files.write(dir.resolve(s"$tag-$i.warc.gz"), bytes)
    }
    shards.length
  }

  test("incremental ingest: new shards land, checkpoint makes files exactly-once") {
    val in = Files.createTempDirectory("warc-landing")
    val out = Files.createTempDirectory("warc-records").toString
    val ckpt = Files.createTempDirectory("warc-ckpt").toString

    val nShards1 = dropShards(in, 0 until 20, "batch1")
    WarcStream.start(spark, in.toString, out, ckpt, Trigger.AvailableNow())
      .awaitTermination()

    val first = spark.read.parquet(out)
    val firstResponses = first.filter(col("record_type") === "response")
    assert(firstResponses.count() == 20)
    // every doc's text round-trips through gzip + WARC + HTTP framing
    val got = firstResponses
      .select(element_at(split(col("target_uri"), "/"), -1).cast("long").as("doc_id"),
        col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    (0 until 20).foreach { i =>
      assert(got(i.toLong) == s"body of document $i with some text")
    }
    // request + warcinfo records arrive too (typed, no text; one
    // warcinfo per shard file)
    assert(first.filter(col("record_type") === "request").count() == 20)
    assert(first.filter(col("record_type") === "warcinfo").count() == nShards1)

    // second arrival: restart from the checkpoint — only the NEW files decode
    dropShards(in, 20 until 30, "batch2")
    WarcStream.start(spark, in.toString, out, ckpt, Trigger.AvailableNow())
      .awaitTermination()
    val all = spark.read.parquet(out).filter(col("record_type") === "response")
    assert(all.count() == 30, "restart must append only the new shards (no re-reads, no dups)")
    assert(all.select("target_uri").distinct().count() == 30)
  }

  test("a malformed shard yields its decodable prefix and the stream survives") {
    val in = Files.createTempDirectory("warc-landing-bad")
    val out = Files.createTempDirectory("warc-records-bad").toString
    val ckpt = Files.createTempDirectory("warc-ckpt-bad").toString

    val shards = WarcJob.encodePartitions(docsDF(0 until 6).coalesce(1)).collect()
    val (_, bytes) = shards.head
    // truncate mid-archive: warcinfo + a prefix of the record members survive
    Files.write(in.resolve("trunc.warc.gz"), bytes.take(bytes.length / 2))
    // pure garbage: zero records, not a failed query
    Files.write(in.resolve("junk.warc.gz"), Array.fill[Byte](256)(0x5a))

    WarcStream.start(spark, in.toString, out, ckpt, Trigger.AvailableNow())
      .awaitTermination()
    val recs = spark.read.parquet(out)
    val n = recs.count()
    assert(n >= 1 && n < 13, s"expected a decoded prefix, got $n")
    assert(recs.filter(col("record_type") === "warcinfo").count() == 1)
  }
}
