package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.Py

/** Data operations of the interactive case viewers
  * (`/root/reference/single_case_knowledge_graph.py`,
  * `/root/reference/case_selection_knowledge_graph.py`). The Dash UI layer
  * is out of scope; what a user queries through it is mapped here. The
  * viewers carry their OWN party/lawyer parsers with semantics that differ
  * from the KG importer's ([[KgJob.parseMultipleParties]] /
  * [[KgJob.parseLawyerSegment]]) — e.g. a party stoplist, a >2-length
  * gate, and a firm filter that drops names containing 'Ltd' or 'Co' —
  * so they are ported separately, quirks preserved. */
object CaseViewer {

  /** `clean_text` (`single_case_knowledge_graph.py:54-58`): None for
    * blank/'unknown' (lowercase compare on the RAW string — " unknown "
    * survives as "unknown"), else trimmed. */
  def cleanText(text: String): Option[String] = {
    if (text == null || Py.strip(text).isEmpty || text.toLowerCase == "unknown") None
    else Some(Py.strip(text))
  }

  /** `parse_parties` (`single_case_knowledge_graph.py:60-83`): '|' split,
    * pre-clean gate (len > 2, stoplist), generic ordinal strip `^\d+\w*\s+`,
    * paren/role removal, post-clean gate (len > 2). */
  def parseParties(partyString: String): Seq[String] = {
    if (partyString == null || partyString.isEmpty) return Seq.empty
    val stoplist = Set("whether the", "Defendant", "Plaintiff")
    val raw = if (partyString.contains("|")) partyString.split('|').toSeq
              else Seq(partyString)
    raw.flatMap { p0 =>
      val p1 = Py.strip(p0)
      if (p1.nonEmpty && p1.length > 2 && !stoplist.contains(p1)) {
        var p = Py.sub("""^\d+\w*\s+""", "", p1)
        p = Py.sub("""\s*\([^)]*\)\s*""", "", p)
        p = Py.sub("""\s*(Plaintiff|Defendant|plaintiff|defendant)\s*""", "", p)
        p = Py.strip(p)
        if (p.nonEmpty && p.length > 2) Some(p) else None
      } else None
    }
  }

  /** `parse_lawyers` (`single_case_knowledge_graph.py:85-120`): (name, type)
    * pairs — lawyers via `(Mr|Ms|Miss) name` with the viewer's lookahead and
    * a > 5 length gate; firms via instructed-by / parenthesized patterns
    * with the viewer's quirk of DROPPING any firm whose name contains 'Ltd'
    * or 'Co' (so "Wong & Co" never becomes a node here). Duplicates are
    * kept, as in the reference (no dedupe across patterns). */
  def parseLawyers(lawyerString: String): Seq[(String, String)] = {
    if (lawyerString == null || lawyerString.isEmpty) return Seq.empty
    val out = Seq.newBuilder[(String, String)]
    for (g <- Py.findAllGroups("""(Mr|Ms|Miss)\s+([A-Za-z\s]+?)(?=,|\s+\(|$)""", lawyerString)) {
      val full = Py.strip(s"${g(0)} ${g(1)}")
      if (full.length > 5) out += ((full, "lawyer"))
    }
    for (p <- Seq("""instructed by ([^,]+?)(?=,|for|$)""", """\(([^)]+)\)""");
         f0 <- Py.findAll(p, lawyerString)) {
      val f = Py.strip(f0)
      if (f.nonEmpty && f.length > 3 && !f.contains("Ltd") && !f.contains("Co"))
        out += ((f, "law_firm"))
    }
    out.result()
  }

  private val tableColumns = Seq(
    "case_number", "file_name", "trial_date", "case_type",
    "judgment_result", "language")

  /** The cases table (`case_selection_knowledge_graph.py:44-58`): the six
    * display columns with '' defaults. */
  def casesTable(records: DataFrame): DataFrame =
    records.select(tableColumns.map(c =>
      coalesce(col(c).cast("string"), lit("")).as(c)): _*)

  /** `search_cases` (`case_selection_knowledge_graph.py:559-588`):
    * case-insensitive substring match across the six search fields,
    * returning table rows. */
  def searchCases(records: DataFrame, term: String): DataFrame = {
    if (term == null || term.isEmpty) return casesTable(records)
    val fields = Seq("case_number", "file_name", "plaintiff", "defendant",
      "judge", "case_type")
    val cond = fields.map(f =>
      lower(coalesce(col(f).cast("string"), lit(""))).contains(term.toLowerCase))
      .reduce(_ || _)
    casesTable(records.filter(cond))
  }
}
