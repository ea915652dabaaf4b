package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{WarcIO, WarcJob}

/** WARC (ISO 28500) egress + ingest: the from-scratch gzip member walk,
  * record grammar, HTTP/1.1 framing (Content-Length and chunked), charset
  * decoding, crafted-length safety, and the distributed round trip — all
  * pinned without any archive library (which is the point: the reader must
  * survive untrusted web-archive bytes on its own). */
class WarcSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-warc-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def utf8(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_8)

  // ------------------------------------------------------------- gzip walk

  test("gunzipMembers splits a multi-member stream exactly") {
    val parts = Seq("first record", "second, longer record " * 10, "third")
    val stream = parts.map(p => WarcIO.gzipMember(utf8(p))).reduce(_ ++ _)
    val out = WarcIO.gunzipMembers(stream).map(new String(_, StandardCharsets.UTF_8)).toSeq
    assert(out == parts)
  }

  test("gunzipMembers handles optional header fields and stops at garbage") {
    // hand-build a member with FNAME + FEXTRA + FHCRC set
    val raw = utf8("payload with extras")
    val deflated = {
      val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](1024)
      val n = d.deflate(buf); d.end()
      java.util.Arrays.copyOf(buf, n)
    }
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(Array[Byte](0x1f, 0x8b.toByte, 8, (4 | 8 | 2).toByte, 0, 0, 0, 0, 0, 0))
    bos.write(Array[Byte](3, 0)) // XLEN=3
    bos.write(Array[Byte](1, 2, 3)) // extra field
    bos.write(utf8("name.txt")); bos.write(0) // FNAME
    bos.write(Array[Byte](0, 0)) // FHCRC (walked, not verified)
    bos.write(deflated)
    val crc = new java.util.zip.CRC32(); crc.update(raw)
    val trailer = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(crc.getValue.toInt).putInt(raw.length).array()
    bos.write(trailer)
    bos.write(utf8("NOT GZIP GARBAGE")) // malformed tail: walk must stop, not throw
    val out = WarcIO.gunzipMembers(bos.toByteArray).toSeq
    assert(out.map(new String(_, StandardCharsets.UTF_8)) == Seq("payload with extras"))
  }

  test("gunzipMembers survives truncation at every byte boundary") {
    val full = WarcIO.gzipMember(utf8("abcdef" * 50)) ++ WarcIO.gzipMember(utf8("tail"))
    (0 until full.length).foreach { cut =>
      val got = WarcIO.gunzipMembers(java.util.Arrays.copyOf(full, cut)).toSeq
      assert(got.size <= 2) // never throws, yields a prefix
    }
  }

  // --------------------------------------------------------- record grammar

  test("plain (uncompressed) WARC parses the same records as gzip") {
    val recs = Seq(
      WarcIO.warcinfoRecord("f.warc", WarcIO.FixedDate),
      WarcIO.requestRecord("https://a.example.org/en/1", WarcIO.FixedDate),
      WarcIO.responseRecord("https://a.example.org/en/1", WarcIO.FixedDate,
        WarcIO.httpResponse(utf8("hello world"), "text/plain", "utf-8", chunked = false)))
    val plain = recs.reduce(_ ++ _)
    val gz = recs.map(WarcIO.gzipMember).reduce(_ ++ _)
    val a = WarcIO.readRecords(plain).toSeq
    val b = WarcIO.readRecords(gz).toSeq
    assert(a == b)
    assert(a.map(_.record_type) == Seq("warcinfo", "request", "response"))
    val resp = a.last
    assert(resp.http_status.contains(200))
    assert(resp.content_type == "text/plain")
    assert(resp.charset == "utf-8")
    assert(resp.text == "hello world")
    assert(resp.n_bytes == 11)
  }

  test("request and warcinfo records carry no text; resource records decode") {
    val res = WarcIO.record("resource", "https://x/y", WarcIO.FixedDate,
      "text/plain; charset=utf-8", utf8("raw resource body"))
    val bin = WarcIO.record("resource", "https://x/z", WarcIO.FixedDate,
      "application/octet-stream", Array[Byte](1, 2, 3))
    val out = WarcIO.readRecords(res ++ bin).toSeq
    assert(out(0).text == "raw resource body")
    assert(out(1).text == null && out(1).n_bytes == 3)
    val req = WarcIO.readRecords(WarcIO.requestRecord("https://x/y", WarcIO.FixedDate)).toSeq
    assert(req.head.text == null && req.head.record_type == "request")
  }

  // ------------------------------------------------------------ HTTP framing

  test("chunked transfer coding reassembles across chunks, extensions ignored") {
    val body = ("0123456789" * 100).getBytes(StandardCharsets.UTF_8) // forces many 211-byte chunks
    val http = WarcIO.httpResponse(body, "text/plain", "utf-8", chunked = true)
    val rec = WarcIO.readRecords(
      WarcIO.responseRecord("https://c/en/2", WarcIO.FixedDate, http)).toSeq.head
    assert(rec.text == "0123456789" * 100)
    assert(rec.n_bytes == 1000)
  }

  test("chunked truncation and crafted sizes yield a prefix, never a throw") {
    // crafted: huge-but-parseable hex size clamps to the buffer
    val head = "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\nTransfer-Encoding: chunked\r\n\r\n"
    val evil = head + "ffffffff\r\nabc"
    val rec1 = WarcIO.readRecords(WarcIO.record("response", "https://c/1",
      WarcIO.FixedDate, "application/http; msgtype=response",
      evil.getBytes(StandardCharsets.ISO_8859_1))).toSeq.head
    assert(rec1.text == "abc") // clamped to what exists
    // unparseable (Long-overflowing) hex size stops cleanly with a prefix
    val evil2 = head + "ffffffffffffffffff\r\nabc"
    val rec2 = WarcIO.readRecords(WarcIO.record("response", "https://c/1b",
      WarcIO.FixedDate, "application/http; msgtype=response",
      evil2.getBytes(StandardCharsets.ISO_8859_1))).toSeq.head
    assert(rec2.text == "")
    // truncate a valid chunked message at every boundary: no throw
    val http = WarcIO.httpResponse(utf8("abcdefghij" * 40), "text/plain", "utf-8", chunked = true)
    val full = WarcIO.record("response", "https://c/2", WarcIO.FixedDate,
      "application/http; msgtype=response", http)
    (0 until full.length by 7).foreach { cut =>
      WarcIO.readRecords(java.util.Arrays.copyOf(full, cut)).toSeq // must not throw
    }
  }

  test("crafted WARC Content-Length clamps; missing length skips the record") {
    val good = WarcIO.responseRecord("https://c/en/3", WarcIO.FixedDate,
      WarcIO.httpResponse(utf8("ok"), "text/plain", "utf-8", chunked = false))
    // declare a Content-Length far past the buffer
    val evil = new String(good, StandardCharsets.ISO_8859_1)
      .replaceFirst("Content-Length: \\d+", "Content-Length: 99999999999999")
      .getBytes(StandardCharsets.ISO_8859_1)
    val out = WarcIO.readRecords(evil).toSeq
    assert(out.size == 1) // clamped to available bytes, parsed once
    val noLen = new String(good, StandardCharsets.ISO_8859_1)
      .replaceFirst("Content-Length: \\d+\r\n", "")
      .getBytes(StandardCharsets.ISO_8859_1)
    assert(WarcIO.readRecords(noLen).isEmpty) // mandatory header absent: stop
  }

  // ---------------------------------------------------------------- charsets

  test("utf-16 entities round-trip; unknown charsets fall back to utf-8") {
    val zh = "原告人訴被告人 — mixed ASCII 123"
    val http16 = WarcIO.httpResponse(zh.getBytes("utf-16"), "text/plain", "utf-16", chunked = false)
    val rec = WarcIO.readRecords(
      WarcIO.responseRecord("https://c/zh/5", WarcIO.FixedDate, http16)).toSeq.head
    assert(rec.text == zh && rec.charset == "utf-16")
    val httpBad = WarcIO.httpResponse(utf8("plain"), "text/plain", "x-no-such-cs", chunked = false)
    val rec2 = WarcIO.readRecords(
      WarcIO.responseRecord("https://c/en/6", WarcIO.FixedDate, httpBad)).toSeq.head
    assert(rec2.text == "plain") // utf-8 fallback, no throw
    val latin = WarcIO.httpResponse("café".getBytes(StandardCharsets.ISO_8859_1),
      "text/plain", "iso-8859-1", chunked = false)
    val rec3 = WarcIO.readRecords(
      WarcIO.responseRecord("https://c/fr/7", WarcIO.FixedDate, latin)).toSeq.head
    assert(rec3.text == "café")
  }

  // ------------------------------------------------------------ mutation fuzz

  test("bit flips, splices and truncations never throw out of readRecords") {
    val docs = (0L until 12L).map(i =>
      (i, s"fuzz document $i body ${"x" * (i.toInt * 13 % 97)}", "en", s"src$i"))
    val base = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(WarcIO.gzipMember(WarcIO.warcinfoRecord("f.warc.gz", WarcIO.FixedDate)))
      docs.foreach { case (id, text, lang, source) =>
        val uri = WarcJob.uriFor(source, lang, id)
        out.write(WarcIO.gzipMember(WarcIO.requestRecord(uri, WarcIO.FixedDate)))
        out.write(WarcIO.gzipMember(WarcIO.responseRecord(uri, WarcIO.FixedDate,
          WarcIO.httpResponse(utf8(text), "text/plain", "utf-8", chunked = id % 3 == 0))))
      }
      out.toByteArray
    }
    val rng = new java.util.Random(20260819L)
    (0 until 600).foreach { _ =>
      val b = base.clone()
      rng.nextInt(3) match {
        case 0 => // bit flips
          (0 until 1 + rng.nextInt(8)).foreach { _ =>
            val p = rng.nextInt(b.length)
            b(p) = (b(p) ^ (1 << rng.nextInt(8))).toByte
          }
          WarcIO.readRecords(b).foreach(r => assert(r.n_bytes >= 0))
        case 1 => // truncation
          val cut = rng.nextInt(b.length)
          WarcIO.readRecords(java.util.Arrays.copyOf(b, cut)).foreach(r => assert(r.n_bytes >= 0))
        case 2 => // splice a length-field region with garbage
          val p = rng.nextInt(b.length - 8)
          (p until p + 8).foreach(i => b(i) = rng.nextInt(256).toByte)
          WarcIO.readRecords(b).foreach(r => assert(r.n_bytes >= 0))
      }
    }
  }

  // --------------------------------------------------- distributed round trip

  test("roundTrip recovers every doc exactly, through real .warc.gz files") {
    import spark.implicits._
    val docs = (0L until 60L).map { i =>
      val lang = Seq("en", "zh", "fr")(i.toInt % 3)
      val text =
        if (lang == "zh") s"判決書第${i}號：原告人獲判勝訴。金額 HK$$${i * 1000}"
        else s"Judgment number $i. The plaintiff ${"narrative " * (i.toInt % 7)}prevails."
      (i, text, lang, s"src${i % 4}")
    }.toDF("doc_id", "text", "lang", "source")

    // in-memory round trip matches the source table exactly
    val rt = WarcJob.roundTrip(spark, docs).collect()
    assert(rt.length == 60)
    val byId = docs.collect().map(r => r.getLong(0) ->
      (r.getString(1), r.getString(2), r.getString(3))).toMap
    rt.foreach { r =>
      val id = r.getLong(0)
      val (text, lang, source) = byId(id)
      assert(r.getString(1) == WarcJob.uriFor(source, lang, id))
      assert(r.getInt(2) == 200)
      assert(r.getString(3) == "text/plain")
      assert(r.getString(4) == (if (id % 5 == 0) "utf-16" else "utf-8"))
      assert(r.getLong(5) == text.length.toLong)
    }

    // the same shards written to disk and read back via the binaryFile
    // source (the 100-TB read path) parse to the same response count
    val dir = Files.createTempDirectory("graft-warc").toFile
    try {
      WarcJob.encodePartitions(docs).collect().foreach { case (name, bytes) =>
        Files.write(new java.io.File(dir, name).toPath, bytes)
      }
      val fromDisk = WarcJob.readWarcFiles(spark, dir.getAbsolutePath)
      val n = fromDisk.toDF().filter(col("record_type") === "response").count()
      assert(n == 60)
      // warcinfo leads each shard on disk too
      val info = fromDisk.toDF().filter(col("record_type") === "warcinfo").count()
      assert(info >= 1)
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }
}
