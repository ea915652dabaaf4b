package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.extract.Cleaners

/** The SparkSessionExtensions install path: a session built with
  * GraftExtensions must expose clean_margin_index as a SQL function. */
class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions installs clean_margin_index into a fresh session") {
    // getOrCreate reuses any existing session and ignores the extensions
    // config — drop the shared session first (suites run sequentially).
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-extensions-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      import spark.implicits._
      val noisy = ((('A' to 'Z') ++ ('A' to 'Z') ++ ('A' to 'J')).map(_.toString) ++
        Seq("IN THE HIGH COURT OF THE", "ACTION NO 5 OF 2020",
          "x" * 300)).mkString("\n")
      Seq(noisy).toDF("raw").createOrReplaceTempView("noisy_docs")
      val got = spark.sql("SELECT clean_margin_index(raw) AS c FROM noisy_docs")
        .collect()(0).getString(0)
      assert(got == Cleaners.cleanPdfIndexArtifacts(noisy))
      assert(got.length < noisy.length, "margin index should have been cut")
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
