package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling for training-data mixing: keep each
  * row with a PER-STRATUM rate (e.g. downsample English to 10%, keep
  * Chinese at 50%) decided by a hash of the row's stable key — not by
  * `rand()`.
  *
  * Why hash-based and not `DataFrame.sample` at 100 TB:
  *  - **retry-stable**: a speculative or re-run task keeps exactly the same
  *    rows (rand()-based sampling resamples per attempt, so a retried
  *    partition silently changes the corpus);
  *  - **map-only**: the decision is a per-row expression on the scan — no
  *    shuffle, no state, composes with predicate pushdown;
  *  - **reproducible across engines/runs**: the sample is a pure function
  *    of (key, rates), so two pipelines sampling the same table agree
  *    row-for-row (and the sample is auditable in SQL).
  *
  * Mechanics: bucket = first two hex chars of md5(key) — 256 equiprobable,
  * key-uniform buckets; keep the row when `bucket < hex(round(rate*256))`
  * (lexicographic order on fixed-width lowercase hex IS numeric order).
  * Rate granularity is therefore 1/256; rates >= 1.0 keep everything.
  */
object SamplingJobs {

  /** The 2-hex-char threshold encoding round(rate*256); None = keep all. */
  private[graft] def thresholdHex(rate: Double): Option[String] = {
    require(rate >= 0.0, s"negative sampling rate $rate")
    val n = math.round(rate * 256).toInt
    if (n >= 256) None else Some(f"$n%02x")
  }

  /** 256-bucket key hash: first two hex chars of md5(key as string). */
  def hashBucket(key: Column): Column =
    substring(md5(key.cast("string").cast("binary")), 1, 2)

  /** Rows of `df` sampled at `rates(stratum)` (falling back to
    * `defaultRate`), plus the `bucket` column that decided each row.
    * Deterministic in (key, rates) — same rows on every run and retry. */
  def stratifiedSample(df: DataFrame, key: Column, stratum: Column,
                       rates: Map[String, Double],
                       defaultRate: Double): DataFrame = {
    val bucket = hashBucket(key)
    val thresholds = (rates.toSeq.sortBy(_._1).map { case (s, r) => (lit(s), r) } :+
      (lit(null).cast("string"), defaultRate))
    // CASE stratum WHEN s THEN bucket < hex(rate) ... ELSE bucket < hex(default)
    val keep = thresholds.init.foldRight(
      thresholdHex(defaultRate).map(bucket < lit(_)).getOrElse(lit(true))) {
      case ((sLit, r), elseCol) =>
        when(stratum === sLit,
          thresholdHex(r).map(bucket < lit(_)).getOrElse(lit(true)))
          .otherwise(elseCol)
    }
    df.withColumn("bucket", bucket).filter(keep)
  }
}
