package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** J3/U1 — merge two result sets with first-set priority
  * (`/root/reference/merge_json_files.py:41-62`): all of set 1, plus set-2
  * records whose `file_name` is not already present. The reference adds
  * each accepted set-2 name to its seen-set AS IT ITERATES, so duplicates
  * WITHIN set 2 also collapse to one record — replicated here by a
  * first-wins dedupe of set 2 on file_name (ordered by doc_id when
  * present, since DataFrames carry no file order). The reference preserves
  * insertion order; Spark output order is undefined, so the equality
  * boundary orders canonically by `file_name` (SURVEY.md §2.3 J3). */
object MergeJob {

  /** First-wins within set 2, deterministic when a `doc_id` ordering column
    * exists. WITHOUT `doc_id` the fallback `dropDuplicates` keeps an
    * ARBITRARY record per file_name — which payload survives can change
    * run to run (the reference's "first seen" is its file iteration order,
    * which a DataFrame does not carry). Callers needing deterministic
    * payload selection must supply `doc_id`; `merge`/`mergeStats` counts
    * are unaffected either way (only the surviving payload varies). */
  private def dedupeWithin(second: DataFrame): DataFrame =
    if (second.columns.contains("doc_id")) {
      val w = Window.partitionBy(col("file_name")).orderBy(col("doc_id"))
      second.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    } else second.dropDuplicates("file_name")

  def merge(first: DataFrame, second: DataFrame): DataFrame = {
    val newOnly = dedupeWithin(second).join(
      first.select(col("file_name")).distinct(),
      Seq("file_name"), "left_anti")
    first.unionByName(newOnly, allowMissingColumns = true)
  }

  /** The reference's merge statistics print-out
    * (`merge_json_files.py:50-62`): set sizes, newly added, duplicates
    * skipped (vs set 1 plus within set 2). */
  def mergeStats(first: DataFrame, second: DataFrame): (Long, Long, Long, Long) = {
    val n1 = first.count()
    val n2 = second.count()
    val added = dedupeWithin(second).join(
      first.select(col("file_name")).distinct(), Seq("file_name"), "left_anti").count()
    (n1, n2, added, n2 - added)
  }

  /** Canonical ordering for byte-stable comparisons. */
  def mergeCanonical(first: DataFrame, second: DataFrame): DataFrame =
    merge(first, second).orderBy(col("file_name"))
}
