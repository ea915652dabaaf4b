package graft.extract

import graft.text.Py
import graft.text.Py.{I, S}

/** P7 — court-name extraction, cleaning and validation
  * (`/root/reference/src/extractor.py:330-437`). The validator is part of
  * the cascade: an invalid match falls through to the next pattern. */
object CourtName {

  private[graft] val englishPatterns = Seq(
    """IN THE\s+(HIGH COURT OF THE\s+HONG KONG SPECIAL ADMINISTRATIVE REGION\s+COURT OF FIRST INSTANCE)""",
    """IN THE\s+(HIGH COURT OF THE\s+HONG KONG SPECIAL ADMINISTRATIVE REGION\s+COURT OF APPEAL)""",
    """IN THE\s+(COURT OF FIRST INSTANCE\s+OF THE HIGH COURT)""",
    """IN THE\s+(HIGH COURT OF THE[^\n]*?\n[^\n]*?HONG KONG SPECIAL ADMINISTRATIVE REGION[^\n]*?\n[^\n]*?COURT OF FIRST INSTANCE)""",
    """IN THE\s+(HIGH COURT OF THE[^\n]*?\n[^\n]*?HONG KONG SPECIAL ADMINISTRATIVE REGION[^\n]*?\n[^\n]*?COURT OF APPEAL)""",
    """IN THE\s+(.*?COURT OF FIRST INSTANCE)""",
    """IN THE\s+(.*?COURT OF APPEAL)""",
    """IN THE\s+(HIGH COURT OF THE\s+HONG KONG SPECIAL ADMINISTRATIVE REGION)""",
    """IN THE\s+(.*?HIGH COURT.*?)(?=ACTION|PROCEEDING|BETWEEN)""",
    """IN THE\s+(.*?COURT.*?)(?=ACTION|PROCEEDING|BETWEEN)""")

  private[graft] val chinesePatterns = Seq(
    """(香港特別行政區高等法院原訟法庭)""",
    """(香港特別行政區高等法院)""",
    """(香\s*港\s*特\s*別\s*行\s*政\s*區\s*高等法院原訟法庭)""",
    """(香\s*港\s*特\s*別\s*行\s*政\s*區\s*高等法院)""",
    """(高等法院原訟法庭)""",
    """(.*?高等法院.*?原訟法庭)""",
    """(.*?高等法院.*?法庭)""")

  def extract(text: String, language: String): String = {
    if (language == "english") {
      // every English pattern starts with literal "IN THE" and captures a
      // "...COURT..." — absent those, no pattern can match (pure speedup);
      // the same prefix anchors the skip-scan (AnchoredScanSpec pins it)
      val folded = Py.foldCase(text)
      if (!folded.contains("in the") || !folded.contains("court")) return ""
      val anchor = Py.LitAnchor(Seq("in the"))
      for (p <- englishPatterns) {
        Py.search1A(p, text, I | S, anchor, folded) match {
          case Some(raw) =>
            val cleaned = cleanCourtName(Py.strip(raw))
            if (validateCourtName(cleaned, language)) return cleaned
          case None =>
        }
      }
    } else {
      for (p <- chinesePatterns) {
        Py.search1(p, text) match {
          case Some(raw) =>
            val cleaned = cleanCourtName(Py.strip(raw))
            if (validateCourtName(cleaned, language)) return cleaned
          case None =>
        }
      }
    }
    ""
  }

  /** `_clean_court_name` (`src/extractor.py:381-399`) — normalizes
    * intra-CJK spacing (香 港 … → 香港…) then strips trailers. */
  def cleanCourtName(courtName: String): String = {
    if (courtName == null || courtName.isEmpty) return ""
    var c = Py.wsCollapse(Py.strip(courtName))
    c = Py.sub("""香\s*港\s*特\s*別\s*行\s*政\s*區""", "香港特別行政區", c)
    c = Py.sub("""香港特別行政區\s+高等法院""", "香港特別行政區高等法院", c)
    c = Py.sub("""\s*-\s*\d+\s*-.*$""", "", c)
    c = Py.sub("""\s*_{5,}.*$""", "", c)
    c = Py.sub("""\s*(?:ACTION NO\.|PROCEEDING|BETWEEN).*$""", "", c, I)
    c = Py.sub("""\s*(?:案件編號|民事訴訟案件|原告人|被告人).*$""", "", c)
    Py.strip(c)
  }

  /** `_validate_court_name` (`src/extractor.py:401-437`). */
  def validateCourtName(courtName: String, language: String): Boolean = {
    if (courtName == null || courtName.isEmpty || courtName.length < 5) return false
    if (courtName.length > 200) return false

    if (language == "english") {
      val up = courtName.toUpperCase
      if (!up.contains("COURT")) return false
      val bad = Seq("BETWEEN", "PLAINTIFF", "DEFENDANT", "ACTION NO", "PROCEEDING", "BEFORE")
      if (bad.exists(up.contains)) return false
      val good = Seq("HIGH COURT", "COURT OF FIRST INSTANCE", "HONG KONG", "ADMINISTRATIVE REGION")
      if (good.exists(up.contains)) return true
      courtName.length <= 100
    } else {
      if (!Seq("法院", "法庭").exists(courtName.contains)) return false
      val bad = Seq("原告", "被告", "案件編號", "申請", "判決", "上訴", "評估", "考慮", "決定")
      if (bad.exists(courtName.contains)) return false
      val good = Seq("香港特別行政區", "高等法院", "原訟法庭", "民事司法管轄")
      if (good.exists(courtName.contains)) return true
      courtName.length <= 50
    }
  }
}
