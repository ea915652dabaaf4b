package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.extract.ExtractAll
import graft.model.CaseRecord
import graft.pipeline.{DocsSource, EnrichmentJob}

class EnrichmentSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-enrich-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("rule-based enrichment classifies and splits lawyer segments") {
    import spark.implicits._
    val docs = DocsSource.fixtureJson(spark, "src/test/resources/fixtures/docs/hca_between/*.json")
    val records = docs.mapPartitions(_.flatMap(ExtractAll.extractRecord))
    val enriched = EnrichmentJob.run(spark, records).collect()
    assert(enriched.nonEmpty)
    assert(enriched.forall(_.enrich_status == "ok"))
    // HCA fixtures have ORDER sections with "Judgment be entered" → Granted
    assert(enriched.exists(_.judgment_result_classified == "Granted"))
    // lawyer segments carry Mr/Ms names + instructed-by firms
    assert(enriched.exists(_.lawyers.nonEmpty))
    assert(enriched.exists(_.law_firms.nonEmpty))
  }

  test("a throwing enricher degrades to per-record fallbacks, never job-fatal") {
    import spark.implicits._
    val docs = DocsSource.fixtureJson(spark, "src/test/resources/fixtures/docs/hca_between/*.json")
    val records = docs.mapPartitions(_.flatMap(ExtractAll.extractRecord))
    object Exploding extends EnrichmentJob.Enricher {
      def enrichBatch(batch: Seq[CaseRecord]): Seq[EnrichmentJob.Enriched] =
        throw new IllegalStateException("remote API down")
    }
    val out = EnrichmentJob.run(spark, records, Exploding).collect()
    assert(out.length == records.count())
    assert(out.forall(_.enrich_status.startsWith("fallback:")))
  }
}
