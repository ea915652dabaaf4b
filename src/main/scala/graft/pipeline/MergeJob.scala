package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J3/U1 — merge two result sets with first-set priority
  * (`/root/reference/merge_json_files.py:41-62`): all of set 1, plus set-2
  * records whose `file_name` is not already present. The reference preserves
  * insertion order; Spark output order is undefined, so the equality
  * boundary orders canonically by `file_name` (SURVEY.md §2.3 J3). */
object MergeJob {

  def merge(first: DataFrame, second: DataFrame): DataFrame = {
    val newOnly = second.join(
      first.select(col("file_name")).distinct(),
      Seq("file_name"), "left_anti")
    first.unionByName(newOnly, allowMissingColumns = true)
  }

  /** Canonical ordering for byte-stable comparisons. */
  def mergeCanonical(first: DataFrame, second: DataFrame): DataFrame =
    merge(first, second).orderBy(col("file_name"))
}
