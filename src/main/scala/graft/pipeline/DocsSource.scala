package graft.pipeline

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.types._

import graft.model.{Doc, Span}

/** Source seam for the `docs` span table (FIXTURES.md §1).
  *
  * Production target is an Iceberg table; the sandbox has no Iceberg runtime
  * (SURVEY.md §7.3) so the same `(doc_id, spans)` schema is read from
  * Parquet or from the committed JSON fixtures — a one-line `format` swap.
  */
object DocsSource {

  val spanSchema: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("media_ref", StringType, nullable = false),
    StructField("offset", IntegerType, nullable = false)))

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("spans", ArrayType(spanSchema, containsNull = false), nullable = false)))

  def parquet(spark: SparkSession, path: String): Dataset[Doc] = {
    import spark.implicits._
    spark.read.schema(docSchema).parquet(path).as[Doc]
  }

  /** Reads the committed golden fixtures (one JSON object per file —
    * multiLine mode). Test/demo scale only. */
  def fixtureJson(spark: SparkSession, globPath: String): Dataset[Doc] = {
    import spark.implicits._
    spark.read.schema(docSchema)
      .option("multiLine", "true")
      .json(globPath)
      .as[Doc]
  }
}
