package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline._

/** Pipeline-level tests: skew partitioning, resumable extraction, report
  * aggregation, merge-dedupe, KG nodes/edges/similar-cases. */
class PipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-pipeline-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmpDir(): String =
    Files.createTempDirectory("graft-test").toString

  test("corpus generation is deterministic and skewed") {
    import spark.implicits._
    val a = CorpusGen.generate(spark, 50, 4).collect().sortBy(_.doc_id)
    val b = CorpusGen.generate(spark, 50, 2).collect().sortBy(_.doc_id)
    assert(a.map(_.doc_id).toSeq == b.map(_.doc_id).toSeq)
    assert(a.zip(b).forall { case (x, y) => x == y },
      "same seed+index must give identical docs regardless of parallelism")
    val sizes = a.map(_.spans.map(_.text.length).sum)
    assert(sizes.max > 10 * (sizes.sum / sizes.length), "corpus must contain giants")
  }

  test("identity keys land each bucket on its intended partition") {
    for (n <- Seq(4, 8, 32, 128)) {
      val keys = ExtractJob.identityKeys(n)
      keys.zipWithIndex.foreach { case (k, b) =>
        val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashLong(k, 42)
        assert(((h % n) + n) % n == b, s"key $k for bucket $b of $n")
      }
    }
  }

  test("skew-aware partitioning spreads giants, fills all partitions, keeps every doc once") {
    import spark.implicits._
    val docs = CorpusGen.generate(spark, 200, 8)
    val parted = ExtractJob.partitionForExtraction(spark, docs, 8, skewThresholdBytes = 100000)
    assert(parted.count() == 200)
    assert(parted.select("doc_id").distinct().count() == 200)
    val byPart = parted
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        it.map(d => (pid, d.spans.map(_.text.length.toLong).sum >= 100000))
      }.collect()
    // identity layout: every one of the 8 partitions must be populated
    assert(byPart.map(_._1).distinct.length == 8,
      s"partitions used: ${byPart.map(_._1).distinct.sorted.toSeq}")
    // giants should not all land in one partition
    val giantParts = byPart.filter(_._2).map(_._1).distinct
    assert(giantParts.length > 1, s"giants all in ${giantParts.toSeq}")
  }

  test("resumable extraction: second run skips done buckets, output complete") {
    import spark.implicits._
    val docs = CorpusGen.generate(spark, 120, 4).cache()
    val out = tmpDir()

    // First run: only 2 waves' worth by limiting buckets per wave and
    // simulating a kill after wave 1 (run with a tiny bucket subset by
    // doing a full run, then deleting some lineage to simulate partial).
    val lineage1 = ExtractJob.runResumable(spark, docs, out, "run1", numBuckets = 8, bucketsPerWave = 4)
    assert(lineage1.map(_.partition_id).toSet == (0 until 8).toSet)
    val n1 = spark.read.parquet(s"$out/records").count()

    // Simulate a killed job: keep only wave-1 lineage (buckets 0-3), rerun.
    val keep = spark.read.parquet(s"$out/lineage").filter(col("partition_id") < 4)
    val lineageTrim = tmpDir() + "/lineage_keep"
    keep.write.parquet(lineageTrim)
    spark.read.parquet(lineageTrim).write.mode("overwrite").parquet(s"$out/lineage")

    val lineage2 = ExtractJob.runResumable(spark, docs, out, "run1", numBuckets = 8, bucketsPerWave = 4)
    assert(lineage2.map(_.partition_id).toSet == (4 until 8).toSet,
      "resume must only process buckets without done lineage")

    val n2 = spark.read.parquet(s"$out/records").count()
    assert(n2 == n1, s"resumed output rows $n2 != full-run rows $n1")
    // content equality against a direct one-shot extraction
    val direct = ExtractJob.extractRecords(spark, docs, 4)
    assert(spark.read.parquet(s"$out/records").select("doc_id").distinct().count()
      == direct.select("doc_id").distinct().count())
  }

  test("lineage replay (same run_id + bucket epoch) double-marks nothing and reprocesses nothing") {
    import spark.implicits._
    import org.apache.spark.sql.SaveMode
    val docs = CorpusGen.generate(spark, 80, 4).cache()
    val out = tmpDir()
    val l1 = ExtractJob.runResumable(spark, docs, out, "runX", numBuckets = 8, bucketsPerWave = 4)
    val n1 = spark.read.parquet(s"$out/records").count()
    val ids1 = spark.read.parquet(s"$out/records")
      .select("doc_id").collect().map(_.getString(0)).sorted.toSeq

    // Speculative-retry simulation: the driver's lineage append for wave 1
    // is replayed verbatim (same run_id, same partition epochs) — e.g. a
    // retried write whose first attempt actually landed.
    l1.filter(_.partition_id < 4).toDS()
      .write.mode(SaveMode.Append).parquet(s"$out/lineage")
    val marks = spark.read.parquet(s"$out/lineage")
      .filter(col("run_id") === "runX" && col("status") === "done")
    assert(marks.groupBy("partition_id").count().filter(col("count") > 1).count() == 4,
      "replay staged: buckets 0-3 carry duplicate done-marks")

    // Resume under duplicated marks: the done-set is keyed (run_id,
    // partition_id), so duplicates are idempotent — nothing reprocessed,
    // no third mark added, records byte-identical.
    val l2 = ExtractJob.runResumable(spark, docs, out, "runX", numBuckets = 8, bucketsPerWave = 4)
    assert(l2.isEmpty, s"resume reprocessed ${l2.map(_.partition_id)}")
    val marksAfter = spark.read.parquet(s"$out/lineage")
      .filter(col("run_id") === "runX" && col("status") === "done")
    assert(marksAfter.count() == marks.count(), "resume must not add marks for done buckets")
    val ids2 = spark.read.parquet(s"$out/records")
      .select("doc_id").collect().map(_.getString(0)).sorted.toSeq
    assert(ids2 == ids1 && ids2.distinct.size == ids2.size,
      "records unchanged and no doc extracted twice")
    assert(spark.read.parquet(s"$out/records").count() == n1)

    // And a replayed WAVE (records write + lineage append re-executed after
    // its marks are lost) stays idempotent: dynamic partition overwrite
    // rewrites only its own buckets.
    val keep = spark.read.parquet(s"$out/lineage").filter(col("partition_id") >= 4).cache()
    keep.count()
    keep.write.mode(SaveMode.Overwrite).parquet(s"$out/lineage")
    val l3 = ExtractJob.runResumable(spark, docs, out, "runX", numBuckets = 8, bucketsPerWave = 4)
    assert(l3.map(_.partition_id).toSet == (0 until 4).toSet)
    val ids3 = spark.read.parquet(s"$out/records")
      .select("doc_id").collect().map(_.getString(0)).sorted.toSeq
    assert(ids3 == ids1, "wave replay must leave the records table byte-identical")
  }

  test("report aggregations match the golden report") {
    import spark.implicits._
    val docs = DocsSource.fixtureJson(spark, "src/test/resources/fixtures/docs/*/*.json")
    val records = docs.mapPartitions(_.flatMap(graft.extract.ExtractAll.extractRecord)).toDF().cache()

    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val golden = mapper.readValue(
      Files.readString(java.nio.file.Paths.get("src/test/resources/fixtures/golden/report.json")),
      classOf[java.util.Map[String, Object]])

    val langGolden = golden.get("language_distribution")
      .asInstanceOf[java.util.Map[String, Number]]
    val langGot = ReportJob.languageDistribution(records).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    langGolden.forEach((k, v) => assert(langGot(k) == v.longValue(), s"lang $k"))

    val ctGolden = golden.get("case_type_distribution")
      .asInstanceOf[java.util.Map[String, Number]]
    val ctGot = ReportJob.caseTypeDistribution(records).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    ctGolden.forEach((k, v) => assert(ctGot.getOrElse(k, 0L) == v.longValue(), s"case_type $k"))

    val fcGolden = golden.get("field_completeness")
      .asInstanceOf[java.util.Map[String, java.util.Map[String, Number]]]
    val fcRows = ReportJob.fieldCompleteness(records, ReportJob.reportFields)
      .collect().map(r => r.getString(0) -> r).toMap
    ReportJob.reportFields.foreach { f =>
      val g = fcGolden.get(f)
      val row = fcRows(f)
      assert(row.getAs[Long]("complete") == g.get("complete").longValue(), s"complete $f")
      assert(row.getAs[Long]("missing") == g.get("missing").longValue(), s"missing $f")
      assert(math.abs(row.getAs[Double]("percentage") - g.get("percentage").doubleValue()) < 1e-9,
        s"percentage $f")
    }
  }

  test("summary row matches the golden total (total_files_processed, success_rate)") {
    import spark.implicits._
    val docs = DocsSource.fixtureJson(spark, "src/test/resources/fixtures/docs/*/*.json")
    val records = docs.mapPartitions(_.flatMap(graft.extract.ExtractAll.extractRecord)).toDF()
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val golden = mapper.readValue(
      Files.readString(java.nio.file.Paths.get("src/test/resources/fixtures/golden/report.json")),
      classOf[java.util.Map[String, Object]])
    val row = ReportJob.summary(records).collect()(0)
    assert(row.getLong(0) ==
      golden.get("total_files_processed").asInstanceOf[Number].longValue())
    assert(row.getDouble(1) == 100.0)
  }

  test("merge keeps first-set priority on file_name (J3)") {
    import spark.implicits._
    val a = Seq(("f1.pdf", "A1"), ("f2.pdf", "A2")).toDF("file_name", "payload")
    val b = Seq(("f2.pdf", "B2"), ("f3.pdf", "B3")).toDF("file_name", "payload")
    val merged = MergeJob.mergeCanonical(a, b).collect()
    assert(merged.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("f1.pdf", "A1"), ("f2.pdf", "A2"), ("f3.pdf", "B3")))
  }

  test("merge collapses duplicates WITHIN the second set (merge_json_files.py seen-set)") {
    import spark.implicits._
    val a = Seq((1L, "f1.pdf", "A1")).toDF("doc_id", "file_name", "payload")
    val b = Seq((10L, "f2.pdf", "B2-first"), (11L, "f2.pdf", "B2-second"),
      (12L, "f3.pdf", "B3")).toDF("doc_id", "file_name", "payload")
    val merged = MergeJob.mergeCanonical(a, b).collect()
      .map(r => (r.getAs[String]("file_name"), r.getAs[String]("payload"))).toSeq
    assert(merged == Seq(("f1.pdf", "A1"), ("f2.pdf", "B2-first"), ("f3.pdf", "B3")))
    val (n1, n2, added, dups) = MergeJob.mergeStats(a, b)
    assert((n1, n2, added, dups) == (1L, 3L, 2L, 1L))
  }

  test("parseMultipleParties mirrors reference semantics") {
    assert(KgJob.parseMultipleParties("WONG TAI MAN") == Seq("WONG TAI MAN"))
    assert(KgJob.parseMultipleParties(
      "WONG TAI MAN (1st Plaintiff) | CHAN SIU MING (2nd Plaintiff)") ==
      Seq("WONG TAI MAN", "CHAN SIU MING"))
    assert(KgJob.parseMultipleParties("") == Seq.empty)
    assert(KgJob.parseMultipleParties("A CO (Defendant)") == Seq("A CO"))
  }

  test("KG nodes/edges: SUES cross-product cardinality and dedupe") {
    import spark.implicits._
    val records = Seq(
      ("ACTION NO 1 OF 2020", "HIGH COURT", "Chan",
        "P1 (1st Plaintiff) | P2 (2nd Plaintiff)", "D1 (1st Defendant) | D2 (2nd Defendant)",
        "Mr John Tse, instructed by Wong & Co, for the plaintiff", "f1.pdf"),
      ("ACTION NO 2 OF 2020", "HIGH COURT", "Chan",
        "P1", "D3", "", "f2.pdf")
    ).toDF("case_number", "court_name", "judge", "plaintiff", "defendant", "lawyer", "file_name")

    val nodes = KgJob.nodes(records)
    val edges = KgJob.edges(records)
    // P1 appears in two cases but is one node
    assert(nodes.filter(col("type") === "Plaintiff").count() == 2)
    assert(nodes.filter(col("type") === "Court").count() == 1)
    // SUES: 2x2 for case 1 + 1x1 for case 2 = 5
    assert(edges.filter(col("rel_type") === "SUES").count() == 5)
    assert(edges.filter(col("rel_type") === "HEARD_IN").count() == 2)
    // lawyer segment of case 1 mentions 'plaintiff' → 1 lawyer × 2 plaintiffs
    assert(edges.filter(col("rel_type") === "REPRESENTED_BY").count() == 2)
    assert(edges.filter(col("rel_type") === "WORKS_FOR").count() == 1)
    val stats = KgJob.nodeStatistics(nodes).collect()
    assert(stats.head.getLong(1) >= stats.last.getLong(1))
  }

  test("KG node props follow the reference property maps (data_importer.py:135-234)") {
    import spark.implicits._
    val records = Seq(
      ("ACTION NO 9 OF 2021", "HIGH COURT", "Chan", "P1", "D1",
        "Mr John Tse, instructed by Wong & Co, for the plaintiff",
        "Civil Action", "Win", "HK$1,000", "english", "f9.pdf")
    ).toDF("case_number", "court_name", "judge", "plaintiff", "defendant",
      "lawyer", "case_type", "judgment_result", "claim_amount", "language", "file_name")
    val nodes = KgJob.nodes(records).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getMap[String, String](2).toMap).toMap

    val caseProps = nodes(("Case", "ACTION NO 9 OF 2021"))
    assert(caseProps("case_number") == "ACTION NO 9 OF 2021")
    assert(caseProps("file_name") == "f9.pdf")
    assert(caseProps("case_type") == "Civil Action")
    assert(caseProps("case_type_cn") == "民事诉讼")
    assert(caseProps("judgment_result_cn") == "胜诉")
    assert(caseProps("claim_amount") == "HK$1,000")
    assert(caseProps("judgment_amount") == "") // absent column → cleaned blank
    assert(nodes(("Court", "HIGH COURT")) == Map("name" -> "HIGH COURT", "type" -> "court"))
    assert(nodes(("Judge", "Chan")) == Map("name" -> "Chan", "role" -> "judge"))
    assert(nodes(("Plaintiff", "P1")) == Map("name" -> "P1", "role" -> "plaintiff"))
    assert(nodes(("Lawyer", "Mr John Tse")) == Map("name" -> "Mr John Tse", "role" -> "lawyer"))
    assert(nodes(("LawFirm", "Wong & Co")) == Map("name" -> "Wong & Co", "type" -> "law_firm"))
  }

  test("blank case_number+file_name cases get distinct stable-hash ids; 'unknown' is cleaned") {
    import spark.implicits._
    val records = Seq(
      ("", "COURT A", "Judge A", "PA", "DA", "", ""),
      ("", "COURT B", "Judge B", "PB", "DB", "", ""),
      ("unknown", "COURT C", "Judge C", "PC", "DC", "", "f3.pdf")
    ).toDF("case_number", "court_name", "judge", "plaintiff", "defendant", "lawyer", "file_name")
    val caseNames = KgJob.nodes(records).filter(col("type") === "Case")
      .select("name").collect().map(_.getString(0)).toSeq
    assert(caseNames.length == 3, s"got $caseNames")
    // two blank-key cases must NOT collapse into one node
    val hashed = caseNames.filter(_.startsWith("case_"))
    assert(hashed.length == 2 && hashed.distinct.length == 2, s"got $caseNames")
    assert(hashed.forall(_.length == 16), "reference truncates to 16 chars")
    // 'unknown' case_number is cleaned away → file_name id
    assert(caseNames.contains("f3.pdf"))
  }

  test("KG query surfaces: queryNodes / queryRelationships / subgraph") {
    import spark.implicits._
    val records = Seq(
      ("ACTION NO 12345 OF 2020", "HIGH COURT", "Chan", "P1", "D1",
        "Mr John Tse, instructed by Wong & Co, for the plaintiff",
        "Civil Action", "Win", "f1.pdf"),
      ("ACTION NO 2 OF 2021", "DISTRICT COURT", "Lee", "P2", "D2", "",
        "Appeal", "Lose", "f2.pdf")
    ).toDF("case_number", "court_name", "judge", "plaintiff", "defendant",
      "lawyer", "case_type", "judgment_result", "file_name")
    val nodes = KgJob.nodes(records)
    val edges = KgJob.edges(records)

    assert(KgJob.queryNodes(nodes, Some("Judge")).count() == 2)
    assert(KgJob.queryNodes(nodes, Some("Case"),
      Map("case_type" -> "Appeal")).count() == 1)
    assert(KgJob.queryRelationships(edges, Some("SUES")).count() == 2)
    assert(KgJob.queryRelationships(edges, limit = 3).count() == 3)

    val (sn, se) = KgJob.subgraph(nodes, edges, caseType = Some("Civil Action"))
    val caseNames = sn.filter(col("type") === "Case")
      .select("name").collect().map(_.getString(0)).toSeq
    assert(caseNames == Seq("ACTION NO 12345 OF 2020"), s"got $caseNames")
    // every surviving edge has both endpoints in the selected node set
    val selSet = sn.select("type", "name").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    se.collect().foreach { e =>
      assert(selSet.contains((e.getAs[String]("src_type"), e.getAs[String]("src_name"))))
      assert(selSet.contains((e.getAs[String]("dst_type"), e.getAs[String]("dst_name"))))
    }
    // display columns follow the visualizer's truncation (only past 20
    // chars: [:17] + "...") and class sizing
    val caseRow = sn.filter(col("type") === "Case").collect()(0)
    assert(caseRow.getAs[String]("display_label") == "ACTION NO 12345 O...")
    assert(caseRow.getAs[Int]("size") == 50)
    val judgeRow = sn.filter(col("type") === "Judge").collect()(0)
    assert(judgeRow.getAs[String]("display_label") == judgeRow.getAs[String]("name"))
    assert(judgeRow.getAs[Int]("size") == 40)
  }

  test("similar cases: theta self-join + per-case top-10 (J2)") {
    import spark.implicits._
    val cases = Seq(
      ("c1", "Action", "HIGH COURT", "granted", 100000.0),
      ("c2", "Action", "HIGH COURT", "granted", 150000.0),
      ("c3", "Action", "HIGH COURT", "dismissed", 120000.0),
      ("c4", "Application", "DISTRICT COURT", "granted", 99999999.0)
    ).toDF("case_key", "case_type", "court_name", "judgment_result", "claim_value")

    val sims = KgJob.similarCases(cases, threshold = 0.7)
    val c1 = sims.filter(col("a_key") === "c1").collect()
    // c2: 0.4+0.2+0.2+0.2 = 1.0; c3: 0.4+0.2+0+0.2 = 0.8; c4: 0.2 only
    assert(c1.map(_.getAs[String]("b_key")).toSet == Set("c2", "c3"))
    val top = c1.maxBy(_.getAs[Double]("similarity"))
    assert(top.getAs[String]("b_key") == "c2")
  }
}
