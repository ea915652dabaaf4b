package graft.pipeline

import java.nio.charset.StandardCharsets

/** Charset sniffing, transcoding, and mojibake repair for crawl payload
  * bytes — the step between "we have the HTTP entity bytes" and "we have
  * the document text". Real crawls cannot trust the Content-Type charset
  * label (servers lie, or omit it), so ingest must detect the encoding
  * from the bytes. Reference behavior surface: the reference reads its
  * corpus as already-decoded text files (`main.py` opens with Python's
  * default UTF-8); this operator family is part of the web-scale ingest
  * tier the brief adds — it feeds [[WarcIO]]'s `WarcRec.text`.
  *
  * All rules here are the published ones:
  *  - BOM sniff per Unicode TR and the WHATWG Encoding Standard §6
  *    ("BOM sniff"): `EF BB BF` → UTF-8, `FF FE` → UTF-16LE,
  *    `FE FF` → UTF-16BE; the BOM is not part of the text.
  *  - UTF-8 validation is the strict RFC 3629 well-formedness check
  *    (shortest-form only, no surrogates, max U+10FFFF) — the same
  *    byte-range table as RFC 3629 §4.
  *  - The fallback single-byte decode is windows-1252 per the WHATWG
  *    Encoding Standard index (the web's de-facto default; HTML5 maps
  *    the `latin-1`/`ascii` labels to it). Bytes 0x80-0x9F use the
  *    index table; the five unassigned index slots (0x81 0x8D 0x8F
  *    0x90 0x9D) map to the corresponding C1 controls, which makes the
  *    256-byte decode a BIJECTION — every byte string round-trips.
  *  - Mojibake repair is ftfy's core trick (Speer, "fixing Unicode for
  *    fun and profit"): text whose windows-1252 RE-ENCODING is valid
  *    multibyte UTF-8 was UTF-8 decoded with the wrong charset once;
  *    re-decode it. Applied iteratively for doubly-mangled text, with
  *    a small fixed bound.
  *
  * Everything is a pure per-row kernel (no allocation beyond the output
  * string, no regex), surfaced as codegen'd expressions in
  * [[graft.plans.CharsetExprs]] so full-corpus decode participates in
  * whole-stage codegen.
  */
object CharsetOps {

  /** WHATWG Encoding Standard index windows-1252, bytes 0x80-0x9F.
    * Unassigned slots fall back to the C1 control of the same value
    * (the standard's behavior for these five bytes). */
  private val C1: Array[Char] = Array(
    0x20AC, 0x0081, 0x201A, 0x0192, 0x201E, 0x2026, 0x2020, 0x2021,
    0x02C6, 0x2030, 0x0160, 0x2039, 0x0152, 0x008D, 0x017D, 0x008F,
    0x0090, 0x2018, 0x2019, 0x201C, 0x201D, 0x2022, 0x2013, 0x2014,
    0x02DC, 0x2122, 0x0161, 0x203A, 0x0153, 0x009D, 0x017E, 0x0178
  ).map(_.toChar)

  /** Inverse of the 0x80-0x9F table (char → byte). */
  private val C1Inv: Map[Char, Byte] =
    C1.zipWithIndex.map { case (c, i) => c -> (0x80 + i).toByte }.toMap

  // ------------------------------------------------------------- validation

  /** Strict RFC 3629 well-formedness scan. Returns
    * (isValidUtf8, sawMultibyteSequence). */
  def validUtf8(b: Array[Byte]): (Boolean, Boolean) = {
    var i = 0
    var multi = false
    val n = b.length
    while (i < n) {
      val b0 = b(i) & 0xFF
      if (b0 < 0x80) i += 1
      else {
        // expected continuation count + bounds on the first continuation
        // byte, straight from the RFC 3629 §4 syntax table
        val (len, lo, hi) =
          if (b0 >= 0xC2 && b0 <= 0xDF) (2, 0x80, 0xBF)
          else if (b0 == 0xE0) (3, 0xA0, 0xBF)
          else if (b0 >= 0xE1 && b0 <= 0xEC) (3, 0x80, 0xBF)
          else if (b0 == 0xED) (3, 0x80, 0x9F) // no surrogates
          else if (b0 >= 0xEE && b0 <= 0xEF) (3, 0x80, 0xBF)
          else if (b0 == 0xF0) (4, 0x90, 0xBF)
          else if (b0 >= 0xF1 && b0 <= 0xF3) (4, 0x80, 0xBF)
          else if (b0 == 0xF4) (4, 0x80, 0x8F) // max U+10FFFF
          else return (false, multi) // 0x80-0xC1, 0xF5-0xFF: never legal
        if (i + len > n) return (false, multi)
        val c1 = b(i + 1) & 0xFF
        if (c1 < lo || c1 > hi) return (false, multi)
        var j = i + 2
        while (j < i + len) {
          val cj = b(j) & 0xFF
          if (cj < 0x80 || cj > 0xBF) return (false, multi)
          j += 1
        }
        multi = true
        i += len
      }
    }
    (true, multi)
  }

  // ------------------------------------------------------------------ sniff

  /** Detected encoding label of raw entity bytes:
    * `utf-8 | utf-16le | utf-16be | ascii | windows-1252`.
    * BOM first; then strict UTF-8 (multibyte present distinguishes it
    * from plain ASCII); anything else is the windows-1252 fallback.
    * BOM-less UTF-16 is deliberately NOT guessed (the WHATWG sniff does
    * not either — a label or BOM is required for wide encodings). */
  def sniff(b: Array[Byte]): String = {
    if (b == null) return null
    val n = b.length
    if (n >= 3 && (b(0) & 0xFF) == 0xEF && (b(1) & 0xFF) == 0xBB &&
        (b(2) & 0xFF) == 0xBF) return "utf-8"
    if (n >= 2 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xFE)
      return "utf-16le"
    if (n >= 2 && (b(0) & 0xFF) == 0xFE && (b(1) & 0xFF) == 0xFF)
      return "utf-16be"
    val (ok, multi) = validUtf8(b)
    if (ok && multi) "utf-8"
    else if (ok) "ascii"
    else "windows-1252"
  }

  // ----------------------------------------------------------------- decode

  /** windows-1252 decode (total: every byte maps). */
  def decode1252(b: Array[Byte], from: Int = 0): String = {
    val sb = new java.lang.StringBuilder(b.length - from)
    var i = from
    while (i < b.length) {
      val v = b(i) & 0xFF
      sb.append(if (v >= 0x80 && v < 0xA0) C1(v - 0x80) else v.toChar)
      i += 1
    }
    sb.toString
  }

  /** windows-1252 encode; null when any char is not representable. */
  def encode1252(s: String): Array[Byte] = {
    val out = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c < 0x80 || (c >= 0xA0 && c <= 0xFF)) out(i) = c.toByte
      else C1Inv.get(c) match {
        case Some(v) => out(i) = v
        case None    => return null
      }
      i += 1
    }
    out
  }

  /** Decode with a caller-supplied label (the HTTP-header path; labels
    * are matched per the WHATWG label table's main aliases). A BOM
    * matching the label is stripped. Unknown labels take the
    * windows-1252 fallback — never a throw. */
  def decodeAs(b: Array[Byte], label: String): String = {
    if (b == null) return null
    val l = if (label == null) "" else label.trim.toLowerCase
    l match {
      case "utf-8" | "utf8" | "unicode-1-1-utf-8" =>
        val from = if (b.length >= 3 && (b(0) & 0xFF) == 0xEF &&
          (b(1) & 0xFF) == 0xBB && (b(2) & 0xFF) == 0xBF) 3 else 0
        new String(b, from, b.length - from, StandardCharsets.UTF_8)
      case "utf-16le" =>
        val from = if (b.length >= 2 && (b(0) & 0xFF) == 0xFF &&
          (b(1) & 0xFF) == 0xFE) 2 else 0
        new String(b, from, b.length - from, StandardCharsets.UTF_16LE)
      case "utf-16be" =>
        val from = if (b.length >= 2 && (b(0) & 0xFF) == 0xFE &&
          (b(1) & 0xFF) == 0xFF) 2 else 0
        new String(b, from, b.length - from, StandardCharsets.UTF_16BE)
      case "utf-16" =>
        // the endianness-unspecified label is BOM-sensitive; BOM-less
        // input defaults to LE per the WHATWG Encoding Standard
        if (b.length >= 2 && (b(0) & 0xFF) == 0xFE && (b(1) & 0xFF) == 0xFF)
          new String(b, 2, b.length - 2, StandardCharsets.UTF_16BE)
        else if (b.length >= 2 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xFE)
          new String(b, 2, b.length - 2, StandardCharsets.UTF_16LE)
        else new String(b, StandardCharsets.UTF_16LE)
      case "ascii" | "us-ascii" =>
        // HTML5 maps the ascii label to windows-1252; high bytes decode
        // rather than error, which is also the safe crawl behavior
        decode1252(b)
      case "windows-1252" | "latin-1" | "latin1" | "iso-8859-1" | "cp1252" =>
        decode1252(b)
      case _ =>
        // Labels outside the natively-handled set: legacy charsets the
        // JDK ships (shift_jis, euc-kr, gbk, big5, koi8-r, iso-8859-2,
        // ...) decode with REPLACE error actions — an unconditional
        // windows-1252 fallback here would turn correctly-labeled
        // CJK/Cyrillic pages into mojibake. Labels the JDK does not
        // know keep the 1252 fallback (total: never a throw).
        try {
          val dec = java.nio.charset.Charset.forName(l).newDecoder()
            .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
            .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
          dec.decode(java.nio.ByteBuffer.wrap(b)).toString
        } catch { case _: Exception => decode1252(b) }
    }
  }

  /** Sniff-then-decode: the no-trusted-label ingest path. */
  def decode(b: Array[Byte]): String = {
    if (b == null) return null
    decodeAs(b, sniff(b))
  }

  /** Header-aware decode: trust `headerLabel` only when the bytes are
    * consistent with it (a UTF-8 label with invalid UTF-8 bytes falls
    * back to the sniff — the "server lied" path). */
  def decodeWithHeader(b: Array[Byte], headerLabel: String): String = {
    if (b == null) return null
    val l = if (headerLabel == null) "" else headerLabel.trim.toLowerCase
    val utf8ish = l == "utf-8" || l == "utf8" || l == "unicode-1-1-utf-8"
    if (utf8ish && !validUtf8(b)._1) decode(b)
    else if (l.isEmpty) decode(b)
    else decodeAs(b, l)
  }

  // ----------------------------------------------------------------- encode

  /** Encode for a label — the sink/synthesis side. UTF-16 output carries
    * its BOM (the convention for wide-encoding files); windows-1252
    * substitutes '?' for unmappable chars (the JDK/iconv convention);
    * ascii drops non-ASCII chars. */
  def encodeAs(s: String, label: String): Array[Byte] = {
    if (s == null) return null
    val l = if (label == null) "" else label.trim.toLowerCase
    l match {
      case "utf-16le" | "utf-16" =>
        val body = s.getBytes(StandardCharsets.UTF_16LE)
        val out = new Array[Byte](body.length + 2)
        out(0) = 0xFF.toByte; out(1) = 0xFE.toByte
        System.arraycopy(body, 0, out, 2, body.length)
        out
      case "utf-16be" =>
        val body = s.getBytes(StandardCharsets.UTF_16BE)
        val out = new Array[Byte](body.length + 2)
        out(0) = 0xFE.toByte; out(1) = 0xFF.toByte
        System.arraycopy(body, 0, out, 2, body.length)
        out
      case "windows-1252" | "latin-1" | "latin1" | "iso-8859-1" | "cp1252" =>
        val strict = encode1252(s)
        if (strict != null) strict
        else s.map(c => if (c < 0x80 || (c >= 0xA0 && c <= 0xFF)) c.toByte
                        else C1Inv.getOrElse(c, '?'.toByte)).toArray
      case "ascii" | "us-ascii" =>
        s.filter(_ < 0x80).getBytes(StandardCharsets.US_ASCII)
      case _ =>
        s.getBytes(StandardCharsets.UTF_8)
    }
  }

  // --------------------------------------------------------------- mojibake

  /** Repair UTF-8-decoded-as-windows-1252 mojibake ("cafÃ©" → "café").
    * A string is mangled iff its windows-1252 re-encoding is strictly
    * valid UTF-8 containing at least one multibyte sequence; then the
    * UTF-8 decode of those bytes is the original text. Iterates (bounded)
    * for doubly-mangled input; anything not matching the signature is
    * returned unchanged — the repair never corrupts clean text that
    * cannot have been produced by the mangle. */
  def fixMojibake(s: String): String = {
    if (s == null) return null
    var cur = s
    var rounds = 0
    while (rounds < 4) {
      // fast path: pure-ASCII text cannot be mojibake
      var ascii = true
      var i = 0
      while (ascii && i < cur.length) { if (cur.charAt(i) >= 0x80) ascii = false; i += 1 }
      if (ascii) return cur
      val enc = encode1252(cur)
      if (enc == null) return cur
      val (ok, multi) = validUtf8(enc)
      if (!ok || !multi) return cur
      cur = new String(enc, StandardCharsets.UTF_8)
      rounds += 1
    }
    cur
  }
}
