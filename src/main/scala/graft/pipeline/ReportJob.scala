package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A1–A4 — the summary report as single-pass DataFrame aggregations
  * (`/root/reference/src/processor.py:181-259`), replacing the reference's
  * driver-side dict loops. Each distribution is a `groupBy().count()`;
  * completeness is one wide agg (partial aggregation map-side for free). */
object ReportJob {

  /** A1 — language distribution. */
  def languageDistribution(records: DataFrame): DataFrame =
    records.groupBy(coalesce(col("language"), lit("unknown")).as("language"))
      .agg(count(lit(1)).as("count"))

  /** A2 — court distribution, names truncated to 50 chars + "..."
    * (`src/processor.py:207-211`); blank/unknown courts excluded. */
  def courtDistribution(records: DataFrame): DataFrame =
    records
      .filter(col("court_name").isNotNull && col("court_name") =!= "" &&
        col("court_name") =!= "unknown")
      .groupBy(
        when(length(col("court_name")) > 50,
          concat(substring(col("court_name"), 1, 50), lit("...")))
          .otherwise(col("court_name")).as("court"))
      .agg(count(lit(1)).as("count"))

  /** A3 — 3-bucket case-type classification (`src/processor.py:213-221`). */
  def caseTypeDistribution(records: DataFrame): DataFrame =
    records
      .filter(col("case_type").isNotNull && col("case_type") =!= "" &&
        col("case_type") =!= "unknown")
      .groupBy(
        when(lower(col("case_type")).contains("application"), "Application")
          .when(lower(col("case_type")).contains("action"), "Action")
          .otherwise("Other").as("bucket"))
      .agg(count(lit(1)).as("count"))

  /** A4 — per-field completeness in ONE pass over the table
    * (`src/processor.py:229-240`): per field, the reference report's
    * `complete` / `missing` / `percentage` triple. Still a single wide agg
    * (partial aggregation map-side for free); the one result row is then
    * unpivoted driver-side-free with `stack`. */
  def fieldCompleteness(records: DataFrame, fields: Seq[String]): DataFrame = {
    val aggs = fields.map { f =>
      sum(when(trim(coalesce(col(f), lit(""))) =!= "", 1).otherwise(0))
        .cast("long").as(f)
    }
    val wide = records.agg(count(lit(1)).as("total"), aggs: _*)
    val stackArgs = fields.map(f => s"'$f', `$f`").mkString(", ")
    wide
      .selectExpr("total", s"stack(${fields.size}, $stackArgs) AS (field, complete)")
      .select(
        col("field"), col("complete"),
        (col("total") - col("complete")).as("missing"),
        when(col("total") > 0,
          col("complete").cast("double") / col("total") * 100.0)
          .otherwise(0.0).as("percentage"))
  }

  val reportFields: Seq[String] = Seq(
    "case_number", "trial_date", "court_name", "plaintiff", "defendant",
    "judge", "case_type", "lawyer", "judgment_result", "claim_amount",
    "judgment_amount", "language", "document_type")

  /** Top-level summary row (`src/processor.py:242-249` minus the
    * timestamp): total_files_processed and the reference's constant
    * success_rate (only successfully-extracted records ever reach the
    * report, so the reference hard-codes 100.0). */
  def summary(records: DataFrame): DataFrame =
    records.agg(
      count(lit(1)).as("total_files_processed"),
      lit(100.0).as("success_rate"))

  /** Full report persisted as one JSON blob (shape of the reference's
    * summary_report_*.json minus timestamps). */
  def writeReport(spark: SparkSession, records: DataFrame, outPath: String): Unit = {
    val lang = languageDistribution(records)
    val court = courtDistribution(records)
    val caseType = caseTypeDistribution(records)
    val completeness = fieldCompleteness(records, reportFields)
    summary(records).write.mode("overwrite").json(s"$outPath/summary")
    lang.write.mode("overwrite").json(s"$outPath/language_distribution")
    court.write.mode("overwrite").json(s"$outPath/court_distribution")
    caseType.write.mode("overwrite").json(s"$outPath/case_type_distribution")
    completeness.write.mode("overwrite").json(s"$outPath/field_completeness")
  }
}
