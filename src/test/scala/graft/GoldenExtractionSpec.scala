package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import graft.extract.ExtractAll
import graft.model.{Doc, Span}

/** The gating correctness suite: for every fixture document, the kernel's
  * 15-field record and output span sequence must equal the goldens generated
  * by RUNNING the reference extractor (tools/gen_fixtures.py, seed 42).
  * Span equality = (kind, text, media_ref, order) per BASELINE.json. */
class GoldenExtractionSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private val fixtures = Paths.get("src/test/resources/fixtures")

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

  private val docFiles: Seq[Path] = {
    val dir = fixtures.resolve("docs")
    Files.walk(dir).iterator().asScala
      .filter(p => p.toString.endsWith(".json")).toSeq.sortBy(_.toString)
  }

  assert(docFiles.nonEmpty, "fixtures missing — run tools/gen_fixtures.py")

  private def goldenStr(m: java.util.Map[String, Object], k: String): String =
    Option(m.get(k)).map(_.asInstanceOf[String]).getOrElse("")

  private def goldenOpt(m: java.util.Map[String, Object], k: String): Option[String] =
    Option(m.get(k)).map(_.asInstanceOf[String])

  for (docFile <- docFiles) {
    val docId = docFile.getFileName.toString.stripSuffix(".json")
    val archetype = docFile.getParent.getFileName.toString

    test(s"record equality: $archetype/$docId") {
      val doc = {
        val m = readJson(docFile)
        Doc(m.get("doc_id").asInstanceOf[String], parseSpans(m))
      }
      val goldenPath = fixtures.resolve(s"golden/records/$docId.json")
      val rec = ExtractAll.extractRecord(doc)
      if (!Files.exists(goldenPath)) {
        assert(rec.isEmpty, s"kernel produced a record but reference dropped $docId")
      } else {
        val g = readJson(goldenPath)
        val r = rec.getOrElse(fail(s"kernel produced no record for $docId"))
        // 15-key core: a key the reference never set (e.g. judge/lawyer on
        // the corrigendum path) maps to "" in the fixed schema.
        assert(r.case_number == goldenStr(g, "case_number"), "case_number")
        assert(r.trial_date == goldenStr(g, "trial_date"), "trial_date")
        assert(r.court_name == goldenStr(g, "court_name"), "court_name")
        assert(r.plaintiff == goldenStr(g, "plaintiff"), "plaintiff")
        assert(r.defendant == goldenStr(g, "defendant"), "defendant")
        assert(r.judge == goldenStr(g, "judge"), "judge")
        assert(r.case_type == goldenStr(g, "case_type"), "case_type")
        assert(r.lawyer == goldenStr(g, "lawyer"), "lawyer")
        assert(r.judgment_result == goldenStr(g, "judgment_result"), "judgment_result")
        assert(r.claim_amount == goldenStr(g, "claim_amount"), "claim_amount")
        assert(r.judgment_amount == goldenStr(g, "judgment_amount"), "judgment_amount")
        assert(r.language == goldenStr(g, "language"), "language")
        assert(r.document_type == goldenStr(g, "document_type"), "document_type")
        assert(r.file_name == goldenStr(g, "file_name"), "file_name")
        assert(r.file_path == goldenStr(g, "file_path"), "file_path")
        // path-specific extras
        assert(r.plaintiff_lawyer == goldenOpt(g, "plaintiff_lawyer"), "plaintiff_lawyer")
        assert(r.defendant_lawyer == goldenOpt(g, "defendant_lawyer"), "defendant_lawyer")
        assert(r.corrected_document_type == goldenOpt(g, "corrected_document_type"), "corrected_document_type")
        assert(r.original_document_date == goldenOpt(g, "original_document_date"), "original_document_date")
        assert(r.corrigendum_date == goldenOpt(g, "corrigendum_date"), "corrigendum_date")
        assert(r.correction_summary == goldenOpt(g, "correction_summary"), "correction_summary")
      }
    }

    test(s"span-sequence equality: $archetype/$docId") {
      val doc = {
        val m = readJson(docFile)
        Doc(m.get("doc_id").asInstanceOf[String], parseSpans(m))
      }
      val golden = {
        val m = readJson(fixtures.resolve(s"golden/spans/$docId.json"))
        parseSpans(m)
      }
      val got = ExtractAll.outSpans(doc).spans
      assert(got.size == golden.size, s"span count ${got.size} != ${golden.size}")
      got.zip(golden).zipWithIndex.foreach { case ((a, b), i) =>
        assert(a.kind == b.kind, s"span $i kind")
        assert(a.media_ref == b.media_ref, s"span $i media_ref")
        assert(a.offset == b.offset, s"span $i offset")
        assert(a.text == b.text, s"span $i text")
      }
    }
  }
}
