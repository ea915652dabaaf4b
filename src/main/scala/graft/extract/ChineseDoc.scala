package graft.extract

import graft.model.CaseRecord
import graft.text.Py

/** The dedicated Chinese-judgment path
  * (`/root/reference/chinese_document_extractor.py`). Routed when
  * `detect_language` says chinese AND `is_chinese_document` confirms
  * (`src/extractor.py:2683-2687`). */
object ChineseDoc {

  /** `extract_chinese_case_number` + `_standardize_chinese_case_number`
    * (`chinese_document_extractor.py:35-90`). */
  def extractCaseNumber(text: String): String = {
    val patterns = Seq(
      """(高院民事訴訟\s*\d+\s*年\s*第\s*\d+\s*號)""",
      """(民事訴訟案件(?:編號)?\s*\d+\s*年\s*第\s*\d+\s*號)""",
      """(香港特別行政區高等法院原訟法庭民事訴訟\s*\d+\s*年\s*第\s*\d+\s*號)""",
      """(民事訴訟\s*\d+\s*年\s*第\s*\d+\s*號)""",
      """(\d{4}\s*年\s*第\s*\d+\s*號)""",
      """案件編號\s*[：:]\s*([^\n]+年第[^\n]+號)""",
      """編號\s*[：:]\s*([^\n]+年第[^\n]+號)""")
    for (p <- patterns) {
      Py.search1(p, text) match {
        case Some(m) => return standardizeCaseNumber(Py.strip(m))
        case None =>
      }
    }
    ""
  }

  def standardizeCaseNumber(caseNumber: String): String = {
    if (caseNumber == null || caseNumber.isEmpty) return ""
    var std = Py.wsCollapse(Py.strip(caseNumber))
    Py.searchGroups("""(\d{4})\s*年\s*第\s*(\d+)\s*號""", std) match {
      case Some(g) =>
        val (year, number) = (g(1), g(2))
        std =
          if (!std.contains("民事訴訟")) s"民事訴訟 $year 年第 $number 號"
          else Py.sub("""(\d{4})\s*年\s*第\s*(\d+)\s*號""", s"$year 年第 $number 號", std)
      case None =>
    }
    std
  }

  /** `extract_chinese_court_name` (`chinese_document_extractor.py:273-288`)
    * — note the hard default when nothing matches. */
  def extractCourtName(text: String): String = {
    val patterns = Seq(
      """(香港特別行政區高等法院原訟法庭)""",
      """(香港特別行政區高等法院)""",
      """(高等法院原訟法庭)""")
    patterns.iterator.flatMap(p => Py.search1(p, text))
      .nextOption().getOrElse("香港特別行政區高等法院原訟法庭")
  }

  /** `extract_chinese_trial_date` (`chinese_document_extractor.py:290-310`)
    * — the hard-coded "2025 年2 月14 日" fallback is a documented reference
    * quirk, reproduced verbatim for parity. */
  def extractTrialDate(text: String): String = {
    val first500Lines = Py.split(text, "\n").take(500).mkString("\n")
    val patterns = Seq(
      """(\d{4}\s*年\s*\d{1,2}\s*月\s*\d{1,2}\s*日)""",
      """聆訊日期\s*[：:]\s*([^\n]+)""",
      """判決日期\s*[：:]\s*([^\n]+)""",
      """審訊日期\s*[：:]\s*([^\n]+)""")
    for (p <- patterns) {
      Py.search1(p, first500Lines) match {
        case Some(m) => return Py.strip(m)
        case None =>
      }
    }
    "2025 年2 月14 日"
  }

  /** `extract_chinese_judge` + `_clean_judge_name`
    * (`chinese_document_extractor.py:187-226`). */
  def extractJudge(text: String): String = {
    val patterns = Seq(
      """\(\s*([^)]+)\s*\)\s*高等法院.*?法官""",
      """([^\n\(]+?)\s+高等法院.*?法官""",
      """法官\s*[：:]\s*([^\n]+)""",
      """主審法官\s*[：:]\s*([^\n]+)""")
    for (p <- patterns) {
      Py.search1(p, text) match {
        case Some(m) =>
          val clean = cleanJudgeName(Py.strip(m))
          if (clean.nonEmpty) return clean
        case None =>
      }
    }
    ""
  }

  def cleanJudgeName(judgeName: String): String = {
    if (judgeName == null || judgeName.isEmpty) return ""
    var c = Py.sub("""(高等法院.*?法官|法官|：)""", "", judgeName)
    c = Py.strip(Py.wsCollapse(c))
    if (c.length >= 2 && c.length <= 10 && !Py.contains("""[a-zA-Z0-9]""", c)) c
    else ""
  }

  /** `_is_lawyer_info` (`chinese_document_extractor.py:165-170`). */
  def isLawyerInfo(text: String): Boolean =
    Seq("律師", "代表", "事務所", "無律師代表", "親自行事", "親自出庭").exists(text.contains)

  /** `_clean_party_name` (`chinese_document_extractor.py:172-185`). */
  def cleanPartyName(name: String): String = {
    if (name == null || name.isEmpty) return ""
    var c = Py.sub("""(無律師代表，親自行事|親自出庭應訊)""", "", name)
    c = Py.sub(""".*律師事務所.*代表""", "", c)
    c = Py.sub("""律師代表""", "", c)
    Py.strip(Py.wsCollapse(Py.strip(c)))
  }

  /** `extract_chinese_parties` → `_extract_parties_from_footer`
    * (`chinese_document_extractor.py:92-163`). The content fallback is a
    * no-op in the reference (returns "",""), preserved. */
  def extractParties(text: String): (String, String) = {
    val footerText = Py.split(text, "\n").takeRight(50).mkString("\n")

    var plaintiff = ""
    Py.search1("""原告人\s*[：:]\s*([^\n]+)""", footerText).foreach { raw =>
      val r = Py.strip(raw)
      if (!isLawyerInfo(r)) plaintiff = cleanPartyName(r)
    }

    var defendant = ""
    val defendantPatterns = Seq(
      """第一被告人\s*[：:]\s*([^\n]+)""",
      """被告人\s*[：:]\s*([^\n]+)""")
    var found = false
    for (p <- defendantPatterns if !found) {
      Py.search1(p, footerText) match {
        case Some(raw) =>
          val r = Py.strip(raw)
          if (!isLawyerInfo(r)) {
            defendant = cleanPartyName(r)
            found = true
          }
        case None =>
      }
    }

    // A partial footer hit is DISCARDED: the reference only returns the
    // footer pair when both sides parsed (`chinese_document_extractor.py:
    // 98-100`); otherwise it falls through to the content extractor, which
    // always returns ("","") (`:148-163`), so the final answer is empty.
    if (plaintiff.nonEmpty && defendant.nonEmpty) (plaintiff, defendant)
    else ("", "")
  }

  /** `extract_chinese_lawyers` (`chinese_document_extractor.py:228-263`). */
  def extractLawyers(text: String): (String, String) = {
    val footerText = Py.split(text, "\n").takeRight(50).mkString("\n")

    var plaintiffLawyer = ""
    Py.search1("""原告人\s*[：:]\s*([^\n]*律師[^\n]*)""", footerText) match {
      case Some(m) => plaintiffLawyer = Py.strip(Py.wsCollapse(Py.strip(m)))
      case None =>
        if (Py.contains("""原告人\s*[：:]\s*無律師代表，親自行事""", footerText))
          plaintiffLawyer = "無律師代表，親自行事"
    }

    var defendantLawyer = ""
    val patterns = Seq(
      """第一被告人\s*[：:]\s*([^\n]*律師[^\n]*)""",
      """被告人\s*[：:]\s*([^\n]*律師[^\n]*)""")
    var found = false
    for (p <- patterns if !found) {
      Py.search1(p, footerText) match {
        case Some(m) =>
          defendantLawyer = Py.strip(Py.wsCollapse(Py.strip(m)))
          found = true
        case None =>
      }
    }

    (plaintiffLawyer, defendantLawyer)
  }

  /** `process_chinese_document` (`chinese_document_extractor.py:312-363`). */
  def process(text: String, docId: String, fileName: String): CaseRecord = {
    val (plaintiff, defendant) = extractParties(text)
    val (plaintiffLawyer, defendantLawyer) = extractLawyers(text)
    CaseRecord(
      doc_id = docId,
      case_number = extractCaseNumber(text),
      trial_date = extractTrialDate(text),
      court_name = extractCourtName(text),
      plaintiff = plaintiff,
      defendant = defendant,
      judge = extractJudge(text),
      case_type = "",        // deferred to LLM stage in the reference
      lawyer = s"原告人: $plaintiffLawyer\n第一被告人: $defendantLawyer",
      judgment_result = "",
      claim_amount = "",
      judgment_amount = "",
      language = "chinese",
      document_type = LangDoc.determineChineseDocumentType(fileName),
      file_name = fileName,
      file_path = fileName,
      plaintiff_lawyer = Some(plaintiffLawyer),
      defendant_lawyer = Some(defendantLawyer))
  }
}
