package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{CorpusGen, MediaJob}
import graft.streaming.StreamingExtract

class StreamingMediaSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-streaming-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(): String = Files.createTempDirectory("graft-sm").toString

  test("streaming ingestion extracts incrementally with exactly-once per file") {
    import spark.implicits._
    val base = tmp()
    val docsPath = s"$base/docs"
    val outPath = s"$base/records"
    val ckpt = s"$base/ckpt"

    // batch 1 lands
    CorpusGen.generate(spark, 40, 2).write.mode("append").parquet(docsPath)
    val q1 = StreamingExtract.start(spark, docsPath, outPath, ckpt)
    q1.awaitTermination()
    val n1 = spark.read.parquet(outPath).count()
    assert(n1 == 40L)

    // batch 2 lands; restart processes ONLY the new files
    CorpusGen.generate(spark, 25, 2, seed = 43L).write.mode("append").parquet(docsPath)
    val q2 = StreamingExtract.start(spark, docsPath, outPath, ckpt)
    q2.awaitTermination()
    val out = spark.read.parquet(outPath)
    assert(out.count() == 65L, "restart must process only newly landed files")
    assert(out.select("doc_id").distinct().count() == 65L)
  }

  test("probeHeader parses real PNG/JPEG/WAV container headers (no codec lib)") {
    def be32(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def be16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)

    // PNG: 8-byte signature + IHDR chunk (len, "IHDR", width, height, ...)
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      be32(13) ++ "IHDR".getBytes ++ be32(640) ++ be32(480) ++
      Array[Byte](8, 6, 0, 0, 0)
    assert(MediaJob.probeHeader("image", png) == Some((640, 480, 3)))

    // JPEG: SOI, APP0 (skipped), SOF0 with precision/height/width/components
    val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte) ++
      Array[Byte](0xff.toByte, 0xe0.toByte) ++ be16(6) ++ "JFIF".getBytes ++
      Array[Byte](0xff.toByte, 0xc0.toByte) ++ be16(11) ++ Array[Byte](8) ++
      be16(333) ++ be16(555) ++ Array[Byte](3, 0, 0)
    assert(MediaJob.probeHeader("image", jpeg) == Some((555, 333, 3)))

    // WAV: RIFF/WAVE, fmt (PCM stereo 16-bit @44100), data of 88200 bytes
    val fmtBody = le16(1) ++ le16(2) ++ le32(44100) ++ le32(176400) ++
      le16(4) ++ le16(16)
    val wav = "RIFF".getBytes ++ le32(36 + 88200) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ fmtBody ++
      "data".getBytes ++ le32(88200) ++ Array.fill[Byte](16)(0)
    assert(MediaJob.probeHeader("audio", wav) == Some((44100, 22050, 1)))

    // unrecognized bytes fall back to the deterministic fake
    assert(MediaJob.probeHeader("image", "not a container".getBytes).isEmpty)
    assert(MediaJob.probeHeader("image", null).isEmpty)
    val (d1, d2, d3, feat) = MediaJob.decodeStub("image", png)
    assert((d1, d2, d3) == (640, 480, 3) && feat.length == 16,
      "decodeStub must use the REAL header dims when the container parses")
  }

  test("media feature extraction: schema, determinism, doc join") {
    import spark.implicits._
    val docs = CorpusGen.generate(spark, 300, 4).toDF()
    val media = MediaJob.synthesizeFromDocs(spark, docs)
    val nMedia = media.count()
    assert(nMedia > 0, "corpus should interleave media spans")
    assert(media.columns.toSet == Set("media_ref", "doc_id", "media_type", "bytes", "meta"))

    val feats = MediaJob.extractFeatures(spark, media)
    val rows = feats.collect()
    assert(rows.length == nMedia)
    assert(rows.forall(_.feature.length == 16))
    assert(rows.forall(r => r.byte_len > 0))
    // determinism: same input → same features
    val again = MediaJob.extractFeatures(spark, media).collect()
      .map(f => f.media_ref -> f.feature.toSeq).toMap
    assert(rows.forall(f => again(f.media_ref) == f.feature.toSeq))
    // media_type dispatch reaches all three stubs
    assert(rows.map(_.media_type).toSet.subsetOf(Set("image", "audio", "video")))

    val joined = MediaJob.joinFeaturesToDocs(docs, feats)
    assert(joined.count() == nMedia)
    assert(joined.filter(col("feature").isNull).count() == 0)
  }

  test("media resize: aspect-preserving geometry, never upscales, 4-dim thumb") {
    import spark.implicits._
    val docs = graft.pipeline.CorpusGen.generate(spark, 300, 4).toDF()
    val media = graft.pipeline.MediaJob.synthesizeFromDocs(spark, docs)
    val features = graft.pipeline.MediaJob.extractFeatures(spark, media)
    val resized = graft.pipeline.MediaJob.resizeImages(spark, features, 256, 256).collect()
    assert(resized.nonEmpty)
    resized.foreach { r =>
      assert(r.out_w <= 256 && r.out_h <= 256)
      assert(r.out_w <= r.src_w && r.out_h <= r.src_h, "never upscale")
      // aspect preserved within rounding
      val srcAspect = r.src_w.toDouble / r.src_h
      val outAspect = r.out_w.toDouble / r.out_h
      assert(math.abs(srcAspect - outAspect) / srcAspect < 0.05,
        s"aspect drift: $srcAspect vs $outAspect")
      assert(r.thumb.length == 4)
    }
    // exact-fit geometry checks on the pure function
    assert(graft.pipeline.MediaJob.fitWithin(1024, 512, 256, 256) == (256, 128))
    assert(graft.pipeline.MediaJob.fitWithin(100, 100, 256, 256) == (100, 100))
    assert(graft.pipeline.MediaJob.fitWithin(512, 1024, 256, 256) == (128, 256))
  }

  test("video frame sampling: every-Nth fan-out bounded by the frame count") {
    import spark.implicits._
    val docs = graft.pipeline.CorpusGen.generate(spark, 300, 4).toDF()
    val media = graft.pipeline.MediaJob.synthesizeFromDocs(spark, docs)
    val features = graft.pipeline.MediaJob.extractFeatures(spark, media)
    val videos = features.filter(_.media_type == "video").collect()
    assume(videos.nonEmpty)
    val frames = graft.pipeline.MediaJob.sampleFrames(spark, features, everyNth = 6)
      .collect().groupBy(_.media_ref)
    videos.foreach { v =>
      val expect = (0 until v.dim3 by 6).toSeq
      val got = frames(v.media_ref).map(_.frame_idx).toSeq.sorted
      assert(got == expect, s"${v.media_ref}: $got vs $expect")
      frames(v.media_ref).foreach(f => assert(f.frame_feature.length == 16))
    }
  }
}
