package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style document quality filtering (Rae et al., "Scaling Language
  * Models: Methods, Analysis & Insights from Training Gopher", 2021,
  * Appendix A1.1 — the public rule set most 100 TB text pipelines start
  * from). Every signal is a native column expression: per-row arithmetic
  * over the normalized text, no UDF, no shuffle — the filter is free at
  * scan time and Catalyst can push the `passes` predicate into a fuller
  * pipeline.
  *
  * Signals (canonical Gopher bounds in parentheses):
  *   - word_count          (50 .. 100_000)
  *   - mean_word_len       (3 .. 10)
  *   - symbol_word_ratio   ('#' or '…'/'...' per word, <= 0.1)
  *   - alpha_word_ratio    (words containing a letter, >= 0.8)
  *   - n_stopwords         (distinct hits from a tiny list, >= 2)
  *
  * The line-based bullet/ellipsis rules are included for completeness but
  * degenerate on single-line documents (ratio 0) — stated here rather than
  * silently skipped. */
object QualityFilters {

  val stopwords: Seq[String] = Seq("the", "and", "of", "to", "a", "in", "is", "that")

  /** Count non-overlapping occurrences of `sub` via replace-length
    * arithmetic (identical semantics in DuckDB). */
  private def occurrences(c: Column, sub: String): Column =
    (length(c) - length(regexp_replace(c, java.util.regex.Pattern.quote(sub), ""))) / sub.length

  /** Adds the signal columns + `passes` to a documents frame. */
  def gopherSignals(documents: DataFrame): DataFrame = {
    val nt = trim(regexp_replace(coalesce(col("text"), lit("")), "\\s+", " "))
    val toks = split(nt, " ")
    val n = when(nt === "", 0).otherwise(size(toks))
    val meanLen = when(n === 0, lit(0.0))
      .otherwise((length(nt) - (n - 1)).cast("double") / n)
    val symbols = occurrences(nt, "#") + occurrences(nt, "...") + occurrences(nt, "…")
    val symbolRatio = when(n === 0, lit(0.0)).otherwise(symbols.cast("double") / n)
    val alphaWords = size(filter(toks, w => w.rlike("[A-Za-z]")))
    val alphaRatio = when(n === 0, lit(0.0)).otherwise(alphaWords.cast("double") / n)
    val nStop = size(array_intersect(
      transform(toks, w => lower(w)), array(stopwords.map(lit): _*)))

    documents
      .withColumn("word_count", n.cast("long"))
      .withColumn("mean_word_len", round(meanLen, 4))
      .withColumn("symbol_word_ratio", round(symbolRatio, 4))
      .withColumn("alpha_word_ratio", round(alphaRatio, 4))
      .withColumn("n_stopwords", nStop.cast("long"))
      .withColumn("passes",
        n >= 50 && n <= 100000 &&
          meanLen >= 3.0 && meanLen <= 10.0 &&
          symbolRatio <= 0.1 &&
          alphaRatio >= 0.8 &&
          nStop >= 2)
  }
}
