package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.pipeline.{WarcIO, WarcRec}

/** Streaming WARC ingest: watch a landing directory for `.warc.gz` shards
  * (the shape a live crawl delivers — Common Crawl publishes ~80k files
  * per snapshot; a crawler drops shards continuously) and decode each new
  * file into typed [[WarcRec]] rows incrementally.
  *
  * Shape at scale:
  *  - the binaryFile file-stream source lists new files per micro-batch;
  *    one file = one task, so parallelism is file count per trigger —
  *    `maxFilesPerTrigger` is the backpressure knob (bound a trigger's
  *    work to what the cluster chews in one micro-batch);
  *  - decode runs in the scan stage via the same prefix-semantics reader
  *    as batch ([[WarcIO.readRecords]]): a malformed shard yields its
  *    decodable prefix, never a failed query;
  *  - the streaming checkpoint makes each file exactly-once across
  *    restarts — the streaming analogue of the batch lineage table — and
  *    the parquet sink's own transaction log makes the output re-readable
  *    mid-stream;
  *  - no watermark/state: WARC records are immutable facts (like the doc
  *    stream in [[StreamingExtract]]), not events.
  */
object WarcStream {

  /** binaryFile source schema (fixed by the format; streaming sources
    * require it stated). */
  val binarySchema: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("modificationTime", TimestampType),
    StructField("length", LongType),
    StructField("content", BinaryType)))

  /** The unbounded typed record stream over a landing directory. Lazy
    * per-shard iterators stream records through the scan stage without
    * materializing a shard's record list. */
  def records(spark: SparkSession, warcDir: String,
              maxFilesPerTrigger: Option[Int] = None): Dataset[WarcRec] = {
    import spark.implicits._
    val reader = spark.readStream
      .format("binaryFile")
      .schema(binarySchema)
      .option("pathGlobFilter", "*.warc*")
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.load(warcDir)
      .select(col("path"), col("content")).as[(String, Array[Byte])]
      .flatMap { case (_, bytes) => WarcIO.readRecords(bytes) }
  }

  /** Start incremental ingest: new shards → parsed records appended as
    * parquet, exactly-once per file via the checkpoint. */
  def start(spark: SparkSession, warcDir: String, outPath: String,
            checkpointPath: String,
            trigger: Trigger = Trigger.AvailableNow(),
            maxFilesPerTrigger: Option[Int] = None): StreamingQuery =
    records(spark, warcDir, maxFilesPerTrigger).writeStream
      .option("checkpointLocation", checkpointPath)
      .trigger(trigger)
      .format("parquet")
      .option("path", outPath)
      .start()
}
