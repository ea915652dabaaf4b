package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{OfficeText, RtfText}

/** RTF extraction: encode/extract round trips (escapes, tabs,
  * paragraphs, \uN unicode incl. surrogate pairs), hand-built RTF the
  * encoder never emits (fonttbl/ignorable destinations, hex bytes,
  * \ucN fallback skipping, nested group state, raw CRLF), routing
  * through OfficeText's kind/text, and totality.
  * Non-trivial codepoints are \u escapes for unambiguity. */
class RtfSpec extends AnyFunSuite {

  test("round trip: escapes, tabs, paragraphs, empty") {
    val texts = Seq(
      "plain ascii",
      "back\\slash and {braces}",
      "tab\there",
      "two\nparagraphs",
      "",
      "a\n\nb")
    texts.foreach { t =>
      assert(RtfText.extract(RtfText.encode(t)) == t, s"rtf: ${t.take(30)}")
    }
  }

  test("round trip: unicode via \\uN incl. signed form and surrogate pair") {
    val texts = Seq(
      "caf\u00e9 \u4e2d\u6587", // é in \u233, 中文 > 32767 → signed
      "emoji a\ud83d\ude00b", // astral: two \u code units
      "\u00e9\u4e2d") // adjacent fallbacks
    texts.foreach { t =>
      assert(RtfText.extract(RtfText.encode(t)) == t, s"uni: ${t.take(20)}")
    }
    // the signed encoding kicks in above 32767 (surrogate halves);
    // BMP chars below that stay unsigned
    assert(RtfText.encode("\ud83d\ude00").contains("\\u-10179?"))
    assert(RtfText.encode("\u4e2d").contains("\\u20013?"))
  }

  test("hand-built: destinations skipped, hex bytes, uc fallback, groups") {
    val rtf = "{\\rtf1\\ansi{\\fonttbl{\\f0 Calibri;}}" +
      "{\\*\\generator LibreOffice}" +
      "\\uc2\\u233AB after \\'e9\\'20ok" +
      "{\\uc1\\u20013?inner}done}"
    // \uc2\u233 skips the TWO fallback chars "AB"; \'e9 is é, \'20 space;
    // the inner group's \uc1 restores on exit but we end anyway
    assert(RtfText.extract(rtf) ==
      "\u00e9 after \u00e9 ok\u4e2dinnerdone")
  }

  test("raw CR/LF ignored; \\~ is a space; \\line is a newline") {
    val rtf = "{\\rtf1 first\r\nsecond\\~third\\line fourth}"
    assert(RtfText.extract(rtf) == "firstsecond third\nfourth")
  }

  test("routing through OfficeText kind/text; totality") {
    val b = RtfText.encode("body \u00e9").getBytes(StandardCharsets.US_ASCII)
    assert(OfficeText.kind(b) == "rtf")
    assert(OfficeText.text(b) == "body \u00e9")
    // docx/odt routing unchanged
    assert(OfficeText.kind(OfficeText.encodeDocx("x")) == "docx")
    assert(RtfText.extract("not rtf") == null)
    assert(RtfText.extract(null) == null)
    assert(RtfText.extract("{\\rtf1 truncated \\u12") != null) // never throws
    assert(RtfText.extract("{\\rtf1 \\'zz bad hex}") == " bad hex") // \'zz swallowed
  }
}
