package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Test-set decontamination — n-gram-overlap detection between a held-out
  * test split and the training corpus (the GPT-3-style published
  * procedure: a training document is contaminated if it shares an N-token
  * shingle with any test document; ubiquitous shingles are excluded by a
  * document-frequency cap, mirroring the "common phrase" carve-out).
  * Beyond-reference; the build brief's training-pipeline family.
  *
  * Scale shape: shingling is IN-ROW (`transform` over window starts +
  * `array_distinct`, then one explode — per-doc dedup costs no shuffle);
  * the overlap is an equi-join on the shingle hash. The DF cap both
  * implements the semantics and bounds the join's skew: no shingle key
  * carries more than `maxDf` corpus rows, so the hottest hash bucket is
  * bounded regardless of corpus size — same defense as the capped ngram
  * dedup (SURVEY §9.10).
  */
object Decontaminate {

  /** Per-document DISTINCT k-token shingle hashes, deduped in-row.
    *
    * Shingle md5s come from the ONE-PASS compiled kernel
    * [[graft.plans.TextHashExprs.tokenShinglesMd5]] — bit-identical to the
    * composed `split` + `transform(slice/array_join/md5)` form it replaced
    * (DecontaminateSpec pins the full differential): since `nt` is
    * single-space-normalized, each space-joined k-token window IS a byte
    * range of `nt`, so the kernel feeds md5 the same bytes without the
    * per-window slice/join/array allocations (measured ~25% of
    * q_decontaminate). Docs with fewer than k tokens yield an empty array
    * (the composed form's `size(toks) >= k` pre-filter), which `explode`
    * then drops. */
  def shingles(documents: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"shingle size must be positive, got $k")
    graft.plans.TextHashExprs.register(documents.sparkSession)
    val nt = trim(regexp_replace(coalesce(col("text"), lit("")), "\\s+", " "))
    documents
      .select(col("doc_id").cast("long").as("doc_id"), nt.as("nt"))
      .filter(col("nt") =!= "")
      .select(col("doc_id"),
        explode(graft.plans.TextHashExprs
          .token_shingles_md5(col("nt"), lit(k))).as("shingle"))
  }

  /** Contaminated training documents: share at least one k-shingle (with
    * corpus document frequency <= maxDf) with any test document. The test
    * split is `doc_id % testMod == 0`. Returns one row per contaminated
    * doc: distinct shared shingles and distinct test docs matched. */
  def contaminated(documents: DataFrame, k: Int, testMod: Long, maxDf: Long): DataFrame = {
    val sh = shingles(documents, k)
    val test = sh.filter(col("doc_id") % testMod === 0)
      .select(col("doc_id").as("test_doc_id"), col("shingle"))
    // the corpus-side shingle explode feeds BOTH the document-frequency
    // cap and the overlap join — persist it once (released via
    // DedupJobs.releaseCached) instead of re-shingling the corpus per
    // consumer; the test side stays lazy (its doc_id filter pushes below
    // the explode, so it shingles ~1/testMod of the docs)
    val corpus = DedupJobs.cacheTracked(sh.filter(col("doc_id") % testMod =!= 0))
    val keep = corpus.groupBy("shingle")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select("shingle")
    corpus
      .join(keep, Seq("shingle"), "left_semi")
      .join(test, "shingle")
      .groupBy("doc_id")
      .agg(
        countDistinct(col("shingle")).as("n_hit_shingles"),
        countDistinct(col("test_doc_id")).as("n_test_docs"))
  }

  /** Removal AUDIT (round-4 verdict #7): one row per (contaminated training
    * doc, test doc) pair with the count of shared capped shingles and the
    * lexicographically smallest shared shingle hash as a reproducible
    * example — what an operator needs to audit WHY a document was removed
    * and which test document triggered it (GPT-3 appendix C reports exactly
    * this kind of per-collision accounting). Same shingling/cap semantics as
    * [[contaminated]]: `contaminated` == this table grouped by doc_id. */
  def contaminationAudit(documents: DataFrame, k: Int, testMod: Long,
                         maxDf: Long): DataFrame = {
    val sh = shingles(documents, k)
    val test = sh.filter(col("doc_id") % testMod === 0)
      .select(col("doc_id").as("test_doc_id"), col("shingle"))
    // same double-consumer persist as [[contaminated]]
    val corpus = DedupJobs.cacheTracked(sh.filter(col("doc_id") % testMod =!= 0))
    val keep = corpus.groupBy("shingle")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select("shingle")
    corpus
      .join(keep, Seq("shingle"), "left_semi")
      .join(test, "shingle")
      .groupBy(col("doc_id"), col("test_doc_id"))
      .agg(
        countDistinct(col("shingle")).as("n_shared_shingles"),
        min(col("shingle")).as("example_shingle"))
  }
}
