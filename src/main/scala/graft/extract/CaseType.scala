package graft.extract

import graft.text.Py
import graft.text.Py.{I, S}

/** P21 — case-type segment extraction with the weight-sorted,
  * prefix-deduped, budgeted combiner
  * (`/root/reference/src/extractor.py:1685-1916`). */
object CaseType {

  final case class Segment(content: String, weight: Int)

  def extract(text0: String, language: String, docType: String): String = {
    // 80000-char cap (src/extractor.py:1691-1693)
    val text = if (text0.length > 80000) Py.sliceTo(text0, 80000) else text0
    if (language == "english") extractEnglishComprehensive(text)
    else extractChineseComprehensive(text)
  }

  /** `_extract_english_case_type_comprehensive` (`src/extractor.py:1706-1780`).
    * Each pattern carries a required-literal guard over the lowercased text:
    * guard false ⟹ the (case-insensitive) regex cannot match, so skipping the
    * scan is a pure speedup (validated by the golden suite). */
  // Layer 1: key sections, weights 10..6, ≤2 matches each. Each row:
  // (pattern, weight, contains-guard, start-of-match anchor) — the anchor
  // lists every literal a match can begin with (AnchoredScanSpec pins the
  // skip-scan == plain-scan equivalence).
  private val keySectionPatterns = Seq(
    ("""Introduction\s*[:\.]?\s*\n((?:[^\n]+\n){3,20})""", 10,
      Seq("introduction"), Py.LitAnchor(Seq("introduction"))),
    ("""(?:BACKGROUND|Background)\s*[:\.]?\s*\n((?:[^\n]+\n){5,25})""", 9,
      Seq("background"), Py.LitAnchor(Seq("background"))),
    ("""(?:FACTS?|Facts?)\s*[:\.]?\s*\n((?:[^\n]+\n){3,20})""", 8,
      Seq("fact"), Py.LitAnchor(Seq("fact"))),
    ("""(?:This is|These are)\s+(?:an?\s+)?(action|application|proceeding|matter|case|appeal|motion|summons)([^\n.]{20,300})""", 7,
      Seq("this is", "these are"), Py.LitAnchor(Seq("this is", "these are"))),
    ("""(?:The|This)\s+(?:plaintiff|applicant|defendant|appellant)\s+(?:seeks?|applies?|brings?|claims?)\s+([^\n.]{30,400})""", 6,
      Seq("plaintiff", "applicant", "defendant", "appellant"),
      Py.LitAnchor(Seq("the", "this"))))

  // Layer 2: judgment-context patterns, weights 5,4
  private val judgmentContextPatterns = Seq(
    ("""(?:ORDER|ORDERS|JUDGMENT|HELD|DISPOSITION)\s*[:\.]?\s*\n((?:[^\n]+\n){2,15})""", 5,
      Seq("order", "judgment", "held", "disposition"),
      Py.LitAnchor(Seq("order", "judgment", "held", "disposition"))),
    ("""(?:For (?:these reasons|the foregoing reasons)|Accordingly|In (?:conclusion|the result))\s*[,.]?\s*([^\n.]{50,500})""", 4,
      Seq("for these reasons", "for the foregoing reasons", "accordingly",
        "in conclusion", "in the result"),
      Py.LitAnchor(Seq("for these reasons", "for the foregoing reasons",
        "accordingly", "in conclusion", "in the result"))))

  private[graft] def englishPatternRows
      : Seq[(String, Int, Seq[String], Py.LitAnchor)] =
    keySectionPatterns ++ judgmentContextPatterns

  def extractEnglishComprehensive(text: String): String = {
    val segments = scala.collection.mutable.ListBuffer.empty[Segment]
    val folded = Py.foldCase(text)

    for ((p, weight, guards, anchor) <- keySectionPatterns if guards.exists(folded.contains)) {
      val matches = Py.findIterA(p, text, I | S, anchor, maxMatches = 2, folded = folded)
      for ((g1, _, _) <- matches) {
        val clean = cleanComprehensiveContent(g1)
        if (clean.length >= 50 && clean.length <= 2000)
          segments += Segment(clean, weight)
      }
    }

    for ((p, weight, guards, anchor) <- judgmentContextPatterns if guards.exists(folded.contains)) {
      val matches = Py.findIterA(p, text, I | S, anchor, maxMatches = 2, folded = folded)
      for ((g1, _, _) <- matches) {
        val clean = cleanComprehensiveContent(g1)
        if (clean.length >= 30 && clean.length <= 1500)
          segments += Segment(clean, weight)
      }
    }

    // Layer 3: long paragraphs with case keywords, weight 2, stop at 8 total
    val caseKeywords = Seq("application", "proceeding", "action", "dispute",
      "matter", "claim", "relief", "judgment", "order")
    val paragraphs = Py.resplit("""\n\s*\n""", text)
    var stop = false
    for (paragraph <- paragraphs if !stop) {
      if (paragraph.length >= 200 && paragraph.length <= 2000 &&
          caseKeywords.exists(paragraph.toLowerCase.contains)) {
        val clean = cleanComprehensiveContent(paragraph)
        if (clean.length >= 100 && clean.length <= 1500) {
          segments += Segment(clean, 2)
          if (segments.length >= 8) stop = true
        }
      }
    }

    combineComprehensiveSegments(segments.toList, 3000)
  }

  /** `_extract_chinese_case_type_comprehensive` (`src/extractor.py:1846-1916`). */
  private val zhKeySectionPatterns = Seq(
    ("""(?:背景|事實|案情|簡介)\s*[：:.]?\s*\n((?:[^\n]+\n){3,20})""", 10,
      Py.LitAnchor(Seq("背景", "事實", "案情", "簡介"))),
    ("""(?:爭議|問題|焦點|糾紛)\s*[：:.]?\s*\n((?:[^\n]+\n){2,15})""", 9,
      Py.LitAnchor(Seq("爭議", "問題", "焦點", "糾紛"))),
    ("""(?:申請人|原告人?)\s*(?:申請|請求|要求|尋求|指稱)\s*([^\n。]{50,500})""", 8,
      Py.LitAnchor(Seq("申請人", "原告"))),
    ("""(?:本案|該案|此案)\s*(?:涉及|關於|係|為)\s*([^\n。]{30,400})""", 7,
      Py.LitAnchor(Seq("本案", "該案", "此案"))))

  private val zhJudgmentPatterns = Seq(
    ("""(?:命令|判令|裁定|判決)\s*[：:.]?\s*\n((?:[^\n]+\n){2,15})""", 6,
      Py.LitAnchor(Seq("命令", "判令", "裁定", "判決"))),
    ("""(?:綜上所述|因此|故此|據此)\s*[，,]?\s*([^\n。]{30,400})""", 5,
      Py.LitAnchor(Seq("綜上所述", "因此", "故此", "據此"))))

  private[graft] def chinesePatternRows: Seq[(String, Int, Py.LitAnchor)] =
    zhKeySectionPatterns ++ zhJudgmentPatterns

  def extractChineseComprehensive(text: String): String = {
    val segments = scala.collection.mutable.ListBuffer.empty[Segment]
    val folded = Py.foldCase(text)

    for ((p, weight, anchor) <- zhKeySectionPatterns) {
      val matches = Py.findIterA(p, text, 0, anchor, maxMatches = 2, folded = folded)
      for ((g1, _, _) <- matches) {
        val clean = cleanComprehensiveContent(g1)
        if (clean.length >= 30 && clean.length <= 1500)
          segments += Segment(clean, weight)
      }
    }

    for ((p, weight, anchor) <- zhJudgmentPatterns) {
      val matches = Py.findIterA(p, text, 0, anchor, maxMatches = 2, folded = folded)
      for ((g1, _, _) <- matches) {
        val clean = cleanComprehensiveContent(g1)
        if (clean.length >= 20 && clean.length <= 1000)
          segments += Segment(clean, weight)
      }
    }

    val caseKeywords = Seq("申請", "爭議", "糾紛", "案件", "法庭", "法院", "判決", "命令", "裁定")
    val paragraphs = Py.resplit("""\n\s*\n""", text)
    var stop = false
    for (paragraph <- paragraphs if !stop) {
      if (paragraph.length >= 150 && paragraph.length <= 1500 &&
          caseKeywords.exists(paragraph.contains)) {
        val clean = cleanComprehensiveContent(paragraph)
        if (clean.length >= 80 && clean.length <= 1200) {
          segments += Segment(clean, 2)
          if (segments.length >= 8) stop = true
        }
      }
    }

    combineComprehensiveSegments(segments.toList, 2500)
  }

  /** `_clean_comprehensive_content` (`src/extractor.py:1782-1802`). */
  def cleanComprehensiveContent(content: String): String = {
    if (content == null || content.isEmpty) return ""
    var c = Py.wsCollapse(Py.strip(content))
    // literal guards: absent the required literal the pattern cannot match
    // (the '-'/'_' subs replace with " " and so can never splice "page"
    // together — the fold-guard computed here stays valid below)
    val hasPage = {
      val f = Py.foldCase(c); f.contains("page") || f.contains("頁")
    }
    if (c.indexOf('-') >= 0) c = Py.sub("""\s*-\s*\d+\s*-\s*""", " ", c)
    if (c.contains("___")) c = Py.sub("""\s*_{3,}\s*""", " ", c)
    if (hasPage) c = Py.sub("""\s*(?:page|頁)\s*\d+.*$""", "", c, I)
    c = Py.sub("""^\s*(?:\d+\.\s*)?""", "", c)
    c = Py.sub("""^[,;.:\s]+""", "", c)
    c = Py.sub("""[.\s]+$""", "", c)
    Py.strip(c)
  }

  /** `_combine_comprehensive_segments` (`src/extractor.py:1804-1844`):
    * stable weight-desc sort, 30-char-prefix dedupe, budgeted concat
    * (≤5 segments; later smaller segments may still fit — no break on a
    * budget miss). */
  def combineComprehensiveSegments(segments: List[Segment], maxLength: Int): String = {
    if (segments.isEmpty) return ""
    val sorted = segments.sortBy(-_.weight) // stable, like Python list.sort

    val selected = scala.collection.mutable.ListBuffer.empty[String]
    var total = 0
    var stop = false
    for (seg <- sorted if !stop) {
      val content = seg.content
      if (content.nonEmpty) {
        val dup = selected.exists(ex =>
          content.length > 30 && ex.length > 30 && content.take(30) == ex.take(30))
        if (!dup && total + content.length <= maxLength) {
          selected += content
          total += content.length
          if (selected.length >= 5) stop = true
        }
      }
    }

    if (selected.isEmpty) return ""
    val result = selected.mkString(" | ")
    if (result.length > maxLength) Py.sliceTo(result, maxLength - 3) + "..."
    else result
  }
}
