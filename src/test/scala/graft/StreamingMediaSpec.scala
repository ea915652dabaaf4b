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

  // Independent PNG encoder for the decode tests: Deflater + CRC32 over
  // hand-assembled chunks, with the FORWARD row filters implemented here
  // (so the kernel's unfilter is checked against a separate derivation).
  private def be32(v: Int) =
    Array[Byte]((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val crc = new java.util.zip.CRC32()
    crc.update(typ.getBytes("US-ASCII")); crc.update(data)
    be32(data.length) ++ typ.getBytes("US-ASCII") ++ data ++ be32(crc.getValue.toInt)
  }
  private def encodePng(w: Int, h: Int, colorType: Int,
                        raw: Array[Byte]): Array[Byte] = {
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    val ihdr = be32(w) ++ be32(h) ++ Array[Byte](8, colorType.toByte, 0, 0, 0)
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](raw.length + 128)
    val n = d.deflate(buf)
    d.end()
    sig ++ pngChunk("IHDR", ihdr) ++ pngChunk("IDAT", buf.take(n)) ++
      pngChunk("IEND", Array.empty[Byte])
  }

  test("PNG pixel decode: inflate + unfilter recovers known pixels (RGB, filter 0)") {
    // 8x8 RGB: left half black, right half white, all rows filter 0
    val w = 8; val h = 8
    val rows = (0 until h).flatMap { _ =>
      0.toByte +: (0 until w).flatMap { x =>
        val v: Byte = if (x < w / 2) 0 else 0xff.toByte
        Seq(v, v, v)
      }
    }.toArray
    val png = encodePng(w, h, 2, rows)
    val (d1, d2, d3, feat) = MediaJob.decodeStub("image", png)
    assert((d1, d2, d3) == (8, 8, 3))
    // 4x4 grid: columns 0-1 over the black half -> -0.5, columns 2-3 -> +0.5
    for (gy <- 0 until 4; gx <- 0 until 4) {
      val expect = if (gx < 2) -0.5f else 0.5f
      assert(math.abs(feat(gy * 4 + gx) - expect) < 1e-3,
        s"cell ($gy,$gx): ${feat(gy * 4 + gx)} vs $expect")
    }
  }

  test("PNG pixel decode: all four non-trivial filters round-trip (grayscale)") {
    // 4x4 grayscale, one row per filter type 1/2/3/4, forward-filtered here
    val w = 4; val h = 4
    val px = Array(
      Array(10, 60, 110, 160),
      Array(35, 85, 135, 185),
      Array(50, 100, 150, 200),
      Array(75, 125, 175, 225))
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    val raw = new scala.collection.mutable.ArrayBuffer[Byte]()
    for (y <- 0 until h) {
      val f = y + 1 // filters 1,2,3,4
      raw += f.toByte
      for (x <- 0 until w) {
        val cur = px(y)(x)
        val left = if (x > 0) px(y)(x - 1) else 0
        val up = if (y > 0) px(y - 1)(x) else 0
        val ul = if (y > 0 && x > 0) px(y - 1)(x - 1) else 0
        val filtered = f match {
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 => cur - paeth(left, up, ul)
        }
        raw += (filtered & 0xff).toByte
      }
    }
    val png = encodePng(w, h, 0, raw.toArray)
    val (d1, d2, d3, feat) = MediaJob.decodeStub("image", png)
    assert((d1, d2, d3) == (4, 4, 1))
    // 4x4 image under a 4x4 grid: one pixel per cell, exactly recoverable
    for (y <- 0 until 4; x <- 0 until 4)
      assert(math.abs(feat(y * 4 + x) - (px(y)(x) / 255.0f - 0.5f)) < 1e-4,
        s"pixel ($y,$x) not recovered: ${feat(y * 4 + x)}")
  }

  test("WAV PCM decode: window RMS from real samples (16-bit and 8-bit)") {
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def wav(bits: Int, data: Array[Byte]): Array[Byte] = {
      val fmtBody = le16(1) ++ le16(1) ++ le32(8000) ++
        le32(8000 * bits / 8) ++ le16(bits / 8) ++ le16(bits)
      "RIFF".getBytes ++ le32(36 + data.length) ++ "WAVE".getBytes ++
        "fmt ".getBytes ++ le32(16) ++ fmtBody ++
        "data".getBytes ++ le32(data.length) ++ data
    }
    // 160 frames 16-bit mono: first half silence, second half half-scale square
    val d16 = (0 until 160).flatMap { i =>
      val v = if (i < 80) 0 else if (i % 2 == 0) 16384 else -16384
      le16(v & 0xffff)
    }.toArray
    val (rate, frames, _, feat) = MediaJob.decodeStub("audio", wav(16, d16))
    assert(rate == 8000 && frames == 160)
    for (k <- 0 until 8)
      assert(math.abs(feat(k) - (-0.5f)) < 1e-4, s"window $k should be silent")
    for (k <- 8 until 16)
      assert(math.abs(feat(k) - 0.0f) < 1e-3, s"window $k should be half-scale RMS")

    // 8-bit: constant 128 = digital silence
    val d8 = Array.fill[Byte](64)(128.toByte)
    val (r8, f8, _, feat8) = MediaJob.decodeStub("audio", wav(8, d8))
    assert(r8 == 8000 && f8 == 64)
    assert(feat8.forall(v => math.abs(v - (-0.5f)) < 1e-4))
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
