package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Guard against compute-heavy per-row stages being serialized by a
  * low-split scan. Small parquet tables (the sandbox's sf0.1 `documents` is
  * one 594 KB file) yield a single input split, so an expensive in-row
  * projection downstream — e.g. the 16-md5s-per-token simhash — runs in ONE
  * task while the other cores idle (the round-2 `q_dedup_simhash`
  * regression: the scale-correct shuffle-free plan was slower locally than
  * the wrong exploded plan purely because the latter accidentally
  * parallelized across reducers).
  *
  * `ensure` round-robins the rows up to the cluster's default parallelism
  * ONLY when the scan yields fewer partitions — at real scale a 100 TB table
  * has thousands of splits, the condition is false, and no shuffle is added.
  * The rows shuffled here are source rows (pre-projection), so the moved
  * bytes are bounded by the input split that was too small to split further.
  */
object ScanParallelism {

  def ensure(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // rdd realizes the physical plan (no job) to count actual input splits
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
