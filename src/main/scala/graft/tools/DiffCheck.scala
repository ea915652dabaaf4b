package graft.tools

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

import graft.extract.ExtractAll
import graft.model.{Doc, Span}

/** Differential checker over a `tools/diff_sweep.py` output directory: for
  * every generated doc, compare the kernel's record and span sequence
  * against the reference extractor's dump. Prints one line per divergence
  * and a summary; exit code 1 if any diverged.
  *
  * `sbt "runMain graft.tools.DiffCheck /tmp/diff_fixtures"` */
object DiffCheck {

  private val mapper = new ObjectMapper()

  private def readJson(p: Path): java.util.Map[String, Object] =
    mapper.readValue(Files.readString(p), classOf[java.util.Map[String, Object]])

  private def parseSpans(m: java.util.Map[String, Object]): Seq[Span] =
    m.get("spans").asInstanceOf[java.util.List[java.util.Map[String, Object]]]
      .asScala.toSeq.map { s =>
        Span(
          s.get("kind").asInstanceOf[String],
          s.get("text").asInstanceOf[String],
          s.get("media_ref").asInstanceOf[String],
          s.get("offset").asInstanceOf[Number].intValue())
      }

  private def g(m: java.util.Map[String, Object], k: String): String =
    Option(m.get(k)).map(_.asInstanceOf[String]).getOrElse("")

  private def gOpt(m: java.util.Map[String, Object], k: String): Option[String] =
    Option(m.get(k)).map(_.asInstanceOf[String])

  def main(args: Array[String]): Unit = {
    val root = Paths.get(args.headOption.getOrElse("/tmp/diff_fixtures"))
    val docFiles = Files.walk(root.resolve("docs")).iterator().asScala
      .filter(_.toString.endsWith(".json")).toSeq.sortBy(_.toString)
    var checked = 0
    var diverged = 0

    for (docFile <- docFiles) {
      val docId = docFile.getFileName.toString.stripSuffix(".json")
      val doc = {
        val m = readJson(docFile)
        Doc(m.get("doc_id").asInstanceOf[String], parseSpans(m))
      }
      checked += 1
      val problems = Seq.newBuilder[String]

      // record equality
      val goldenRec = root.resolve(s"golden/records/$docId.json")
      val rec = ExtractAll.extractRecord(doc)
      if (!Files.exists(goldenRec)) {
        if (rec.nonEmpty) problems += "kernel produced a record but reference dropped the doc"
      } else rec match {
        case None => problems += "kernel produced no record but reference did"
        case Some(r) =>
          val gm = readJson(goldenRec)
          val fields: Seq[(String, String, String)] = Seq(
            ("case_number", r.case_number, g(gm, "case_number")),
            ("trial_date", r.trial_date, g(gm, "trial_date")),
            ("court_name", r.court_name, g(gm, "court_name")),
            ("plaintiff", r.plaintiff, g(gm, "plaintiff")),
            ("defendant", r.defendant, g(gm, "defendant")),
            ("judge", r.judge, g(gm, "judge")),
            ("case_type", r.case_type, g(gm, "case_type")),
            ("lawyer", r.lawyer, g(gm, "lawyer")),
            ("judgment_result", r.judgment_result, g(gm, "judgment_result")),
            ("claim_amount", r.claim_amount, g(gm, "claim_amount")),
            ("judgment_amount", r.judgment_amount, g(gm, "judgment_amount")),
            ("language", r.language, g(gm, "language")),
            ("document_type", r.document_type, g(gm, "document_type")))
          for ((k, got, want) <- fields if got != want)
            problems += s"$k: got <$got> want <$want>"
          val opts: Seq[(String, Option[String], Option[String])] = Seq(
            ("plaintiff_lawyer", r.plaintiff_lawyer, gOpt(gm, "plaintiff_lawyer")),
            ("defendant_lawyer", r.defendant_lawyer, gOpt(gm, "defendant_lawyer")),
            ("corrected_document_type", r.corrected_document_type, gOpt(gm, "corrected_document_type")),
            ("original_document_date", r.original_document_date, gOpt(gm, "original_document_date")),
            ("corrigendum_date", r.corrigendum_date, gOpt(gm, "corrigendum_date")),
            ("correction_summary", r.correction_summary, gOpt(gm, "correction_summary")))
          for ((k, got, want) <- opts if got != want)
            problems += s"$k: got <$got> want <$want>"
      }

      // span-sequence equality
      val goldenSpans = parseSpans(readJson(root.resolve(s"golden/spans/$docId.json")))
      val gotSpans = ExtractAll.outSpans(doc).spans
      if (gotSpans.size != goldenSpans.size)
        problems += s"span count ${gotSpans.size} != ${goldenSpans.size}"
      else gotSpans.zip(goldenSpans).zipWithIndex.foreach { case ((a, b), i) =>
        if (a.kind != b.kind || a.media_ref != b.media_ref ||
            a.offset != b.offset || a.text != b.text)
          problems += s"span $i differs"
      }

      val ps = problems.result()
      if (ps.nonEmpty) {
        diverged += 1
        ps.foreach(p => println(s"DIVERGE $docId :: $p"))
      }
    }
    println(s"DIFFCHECK checked=$checked diverged=$diverged")
    if (diverged > 0) sys.exit(1)
  }
}
