package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.extract.ExtractAll
import graft.model.{Doc, Span}

/** S3 — the page-tagged render must follow `direct_llm_extractor.py:126-133`
  * exactly: `\n=== PAGE n ===\n` + page text + `\n=== END PAGE n ===\n` per
  * non-empty page, with page numbers from the enumerate index over ALL
  * pages (empty pages skip their number silently). */
class PageMarkersSpec extends AnyFunSuite {

  private def textSpan(t: String, off: Int) = Span("text", t, "", off)

  test("non-empty pages render between PAGE/END PAGE markers") {
    val doc = Doc("d1", Seq(textSpan("First page.", 0), textSpan("Second page.", 1)))
    assert(ExtractAll.renderWithPageMarkers(doc) ==
      "\n=== PAGE 1 ===\nFirst page.\n=== END PAGE 1 ===\n" +
      "\n=== PAGE 2 ===\nSecond page.\n=== END PAGE 2 ===\n")
  }

  test("empty pages consume a page number but emit nothing; media spans are not pages") {
    val doc = Doc("d2", Seq(
      textSpan("A", 0),
      textSpan("", 1),                       // page 2: empty → skipped, number consumed
      Span("media", "", "img://d2/1", 2),    // not a page
      textSpan("B", 3)))                     // page 3
    assert(ExtractAll.renderWithPageMarkers(doc) ==
      "\n=== PAGE 1 ===\nA\n=== END PAGE 1 ===\n" +
      "\n=== PAGE 3 ===\nB\n=== END PAGE 3 ===\n")
  }

  test("all-empty and empty-span docs render to the empty string") {
    assert(ExtractAll.renderWithPageMarkers(Doc("d3", Seq(textSpan("", 0)))) == "")
    assert(ExtractAll.renderWithPageMarkers(Doc("d4", Seq.empty)) == "")
    assert(ExtractAll.renderWithPageMarkers(Doc("d5", null)) == "")
  }
}
