package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.pipeline.{CorpusGen, DocsSource, ExtractJob}

/** Benchmark main (driver contract): times the headline queries at
  * `SPARK_GRAFT_SF_DIR` and the extraction kernel's throughput over a
  * parquet-staged synthetic corpus, printing ONE JSON line.
  *
  * Actions use the `noop` sink so the full plan materializes without
  * write-side effects; the extraction corpus is staged to parquet first so
  * the timed section measures scan→kernel, not corpus generation. */
object Bench {

  def timeIt[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // ~8MB corpus files must not bin-pack into 2-3 scan partitions: the
      // scan+shuffle-write stage would serialize (measured 4.5/32 cores busy)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm the session (codegen, parquet footers, shuffle machinery) so the
    // first timed query doesn't absorb JVM startup.
    spark.range(100000).selectExpr("sum(id)").collect()
    try noop(SparkEntry.queries("q_lang_dist")(spark, sfDir))
    catch { case _: Throwable => }

    val headline = Seq(
      "q_pricing_summary", "q_revenue_by_segment", "q_top_orders_per_cust",
      "q_similar_docs", "q_events_hourly", "q_dedup_exact", "q_dedup_minhash",
      "q_dedup_minhash_verified", "q_dedup_components", "q_dedup_ngram_capped",
      "q_dedup_embedding", "q_dedup_simhash", "q_ann_cosine", "q_ann_lsh_topk",
      "q_ann_quantized", "q_ann_lsh_quantized", "q_ann_ivf_quantized",
      "q_ann_hyperplane_quantized", "q_ann_ivf_probe",
      "q_fingerprint", "q_quality_score",
      "q_sample_stratified", "q_html_extract", "q_layout_order",
      "q_chunks", "q_chunk_pack", "q_quality_gopher", "q_quality_repetition",
      "q_decontaminate", "q_training_pipeline", "q_training_pipeline_neardup",
      "q_warc_roundtrip", "q_url_canonicalize", "q_url_site_stats",
      "q_robots_filter", "q_dedup_incremental",
      "q_link_extract", "q_host_graph", "q_pagerank", "q_anchor_stats",
      "q_line_dedup", "q_redirect_resolve",
      "q_charset_sniff", "q_mojibake_fix", "q_pii_stats", "q_lm_quality",
      "q_dedup_substr", "q_office_text", "q_unicode_norm", "q_feed_entries",
      "q_host_quota", "q_rtf_text")

    // JIT/codegen warm pass at the smallest SF (same plan shapes → same
    // generated classes) so the timed runs measure steady state, not
    // first-compilation of each query's codegen output.
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).exists() && warmDir != sfDir) {
      headline.foreach { name =>
        try noop(SparkEntry.queries(name)(spark, warmDir))
        catch { case _: Throwable => }
      }
    }

    // Best of 2 reps per query: the first rep can absorb a cold parquet
    // page cache or a stray codegen compile; the min is the steady state.
    // The cache is cleared between reps — the dedup pipelines persist
    // reused intermediates, and Spark's cache manager would otherwise hand
    // rep 2 the previous rep's materialized tables (measuring a cache read,
    // not the pipeline).
    // Both rep times are RECORDED (round-3 verdict #4): `queries` carries
    // the min (steady state), `query_reps` the raw [rep1, rep2] — a future
    // reader can tell host-contention burst noise (one rep spiking 3-5x)
    // from a real regression (both reps slow) without re-running the bench.
    val results: Seq[(String, Seq[Double])] = headline.map { name =>
      val fn = SparkEntry.queries(name)
      val reps = try {
        // one untimed warm rep at the TARGET sf: the sf0.001 pass warms
        // codegen/plan shapes but not the target files' page cache or the
        // scan-side decompression JIT, which was costing the first timed
        // queries 1-2 s of one-off noise.
        graft.pipeline.DedupJobs.releaseCached()
        spark.catalog.clearCache()
        noop(fn(spark, sfDir))
        (1 to 2).map { _ =>
          graft.pipeline.DedupJobs.releaseCached()
          spark.catalog.clearCache()
          timeIt(noop(fn(spark, sfDir)))._2
        }.toSeq
      } catch { case _: Throwable => Seq(-1.0) }
      name -> reps
    }
    graft.pipeline.DedupJobs.releaseCached()
    spark.catalog.clearCache()

    // Extraction throughput: stage corpus once, then time scan→kernel→noop.
    val nDocs = SparkEntry.corpusSize(sfDir)
    val corpusPath = s"/tmp/graft_bench_corpus_$nDocs"
    if (!new java.io.File(corpusPath).exists()) {
      CorpusGen.generate(spark, nDocs, cpus.toInt)
        .write.mode("overwrite").parquet(corpusPath)
    }
    val docs = DocsSource.parquet(spark, corpusPath)
    val stats = ExtractJob.withDocBytes(docs.toDF())
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)),
        org.apache.spark.sql.functions.sum(org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.col("spans"))),
        org.apache.spark.sql.functions.sum(org.apache.spark.sql.functions.col("doc_bytes")))
      .collect()(0)
    val (totalDocs, totalSpans, totalBytes) =
      (stats.getLong(0), stats.getLong(1), stats.getLong(2))

    // Kernel JIT/codegen warm at demo size first, so `extract_warmup` below
    // (which lands in `total`) measures page-cache/steady-state effects on
    // the real corpus, not first-compilation of the extraction classes.
    try noop(ExtractJob.extractRecords(
      spark, CorpusGen.generate(spark, 500, cpus.toInt), cpus.toInt).toDF())
    catch { case _: Throwable => }

    val (_, warm) = timeIt(noop(
      ExtractJob.extractRecords(spark, docs, cpus.toInt).toDF()))
    val (_, tExtract) = timeIt(noop(
      ExtractJob.extractRecords(spark, docs, cpus.toInt).toDF()))
    val (_, tSpans) = timeIt(noop(
      ExtractJob.extractOutSpans(spark, docs, cpus.toInt).toDF()))

    val docsPerSec = totalDocs / math.max(tExtract, 1e-9)
    val spansPerSec = totalSpans / math.max(tExtract, 1e-9)
    val charsPerSec = totalBytes / math.max(tExtract, 1e-9)

    val queryTimes = results.map { case (k, reps) => k -> reps.min } :+
      ("extract_records" -> tExtract) :+
      ("extract_spans" -> tSpans) :+ ("extract_warmup" -> warm)
    val qs = queryTimes.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val repsJson = results.map { case (k, reps) =>
      "\"" + k + "\":" + reps.map(r => f"$r%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = queryTimes.map(_._2).filter(_ >= 0).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"query_reps":$repsJson,"sf":"$sfDir","extraction":{"docs":$totalDocs,"spans":$totalSpans,"chars":$totalBytes,"docs_per_sec":$docsPerSec%.1f,"spans_per_sec":$spansPerSec%.1f,"chars_per_sec":$charsPerSec%.1f},"cpus":$cpus}""")
    spark.stop()
  }
}
