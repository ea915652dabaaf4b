package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.extract.HtmlContent
import graft.model.Span

/** An HTML page keyed by the corpus doc id. */
final case class HtmlDoc(doc_id: Long, html: String)

/** Extracted main-content span sequence for one HTML page. */
final case class HtmlSpans(doc_id: Long, spans: Seq[Span])

/** Spark plumbing for the HTML main-content extractor ([[HtmlContent]]).
  *
  * The extraction itself is a pure `String => Seq[Span]` function run
  * inside `mapPartitions` — one narrow pass, no shuffle: at 100 TB the
  * only data movement is the scan itself. Columns are projected BEFORE the
  * typed map so Parquet/Iceberg column pruning still applies (an opaque
  * lambda on the full row would defeat it — SURVEY.md §5).
  */
object HtmlJob {

  /** Deterministic synthetic page: wraps a corpus document's text in
    * realistic site chrome (linkful header/nav, aside, footer — all
    * boilerplate by construction) around an `<article>` holding the text as
    * one paragraph, one heading, and one media figure. Used by tests and
    * the `q_html_extract` driver query: the chrome is fixed, so the
    * expected extraction is computable from the bare text (the DuckDB
    * oracle replays the WSDM-2010 word-count rule in SQL).
    *
    * Kept in Scala (not Column expressions) so the tokenizer sees real
    * entity escapes: `&`/`<`/`>` in the text are escaped here and must
    * round-trip through [[HtmlContent.extract]].
    */
  def chromePage(docId: Long, text: String): String = {
    val escaped = escapeHtml(if (text == null) "" else text)
    new java.lang.StringBuilder(escaped.length + 1024)
      .append("<!DOCTYPE html>\n<html><head><title>Graft Portal</title>")
      .append("<style>p{margin:0}</style><script>var trk=1;</script></head>\n")
      .append("<body>\n<header><h1><a href=\"/\">Graft Portal</a></h1>\n")
      .append("<nav><ul><li><a href=\"/home\">Home</a></li>")
      .append("<li><a href=\"/cases\">Cases</a></li>")
      .append("<li><a href=\"/about\">About</a></li></ul></nav></header>\n")
      .append("<aside><p><a href=\"/r/1\">Related one</a> ")
      .append("<a href=\"/r/2\">Related two</a> ")
      .append("<a href=\"/r/3\">Related three</a></p></aside>\n")
      .append("<article>\n<h1>Case Report ").append(docId).append("</h1>\n")
      .append("<p>").append(escaped).append("</p>\n")
      .append("<img src=\"img://").append(docId).append("/0\"/>\n")
      .append("</article>\n")
      .append("<footer><p><a href=\"/terms\">Terms</a> ")
      .append("<a href=\"/privacy\">Privacy</a> All rights reserved</p></footer>\n")
      .append("</body></html>\n")
      .toString
  }

  def escapeHtml(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 16)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** documents table → synthetic HTML pages (deterministic, no RNG). */
  def wrapCorpus(spark: SparkSession, documents: DataFrame): Dataset[HtmlDoc] = {
    import spark.implicits._
    // NULL text reads as the empty document (matches the oracles'
    // coalesce(text, '')) — without this the Scala interpolation in
    // chromePage would render a literal "null".
    documents.select(col("doc_id").cast("long"), coalesce(col("text"), lit("")))
      .as[(Long, String)]
      .map { case (id, text) => HtmlDoc(id, chromePage(id, text)) }
  }

  /** The extraction job: one narrow `mapPartitions` over (doc_id, html).
    * `ScanParallelism.ensure` guards the sandbox's single-split small
    * tables; at scale it is a no-op (SURVEY.md §5, round-2 fix). */
  def extractMainContent(spark: SparkSession, pages: Dataset[HtmlDoc]): Dataset[HtmlSpans] = {
    import spark.implicits._
    ScanParallelism.ensure(pages.toDF()).as[HtmlDoc]
      .mapPartitions(_.map(d => HtmlSpans(d.doc_id, HtmlContent.extract(d.html))))
  }
}
