package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.Py

/** The knowledge graph as two relations (SURVEY.md §2.3/§3.4):
  * `nodes(type, name, props)` and `edges(src_type, src_name, rel_type,
  * dst_type, dst_name)` — replacing the reference's per-row Neo4j bolt
  * writes (`knowledge_graph/data_importer.py:115-374`). Entity identity is
  * `(type, name)` after `dropDuplicates` (the relational form of the
  * reference's entity cache, `data_importer.py:238-250`). */
object KgJob {

  /** `parse_multiple_parties` (`data_importer.py:42-71`) as a pure function:
    * split on '|', strip ordinal/role decorations. */
  def parseMultipleParties(partyString: String): Seq[String] = {
    if (partyString == null || Py.strip(partyString).isEmpty) return Seq.empty
    val raw = if (partyString.contains("|")) partyString.split('|').toSeq
              else Seq(partyString)
    raw.flatMap { p0 =>
      var p = Py.strip(p0)
      if (p.nonEmpty) {
        p = Py.sub("""^\d+st\s+""", "", p)
        p = Py.sub("""^\d+nd\s+""", "", p)
        p = Py.sub("""^\d+rd\s+""", "", p)
        p = Py.sub("""^\d+th\s+""", "", p)
        p = Py.sub("""\s*\([^)]*\)\s*""", "", p)
        p = Py.sub("""\s*(Plaintiff|Defendant|plaintiff|defendant)\s*""", "", p)
        p = Py.strip(p)
        if (p.nonEmpty && p.length > 1) Some(p) else None
      } else None
    }
  }

  /** `parse_lawyer_segment` (`data_importer.py:73-113`): lawyers
    * (Mr/Ms/Miss + name) and law firms from the segment text. */
  def parseLawyerSegment(segment: String): (Seq[String], Seq[String]) = {
    if (segment == null || segment.isEmpty) return (Seq.empty, Seq.empty)
    val lawyers = scala.collection.mutable.LinkedHashSet.empty[String]
    val firms = scala.collection.mutable.LinkedHashSet.empty[String]
    for (part0 <- Py.resplit("""\|""", segment)) {
      val part = Py.strip(part0)
      if (part.nonEmpty) {
        for (g <- Py.findAllGroups("""(Mr|Ms|Miss)\s+([A-Za-z\s]+?)(?=,|\s+instructed|\s+of|\s+for|$)""", part))
          lawyers += Py.strip(s"${g(0)} ${g(1)}")
        for (p <- Seq("""instructed by ([^,]+?)(?=,|for|$)""",
                      """of ([^,]+?)(?=,|for|$)""",
                      """\(([^)]+)\)""");
             f0 <- Py.findAll(p, part)) {
          val f = Py.strip(f0)
          if (f.nonEmpty && f.length > 3) firms += f
        }
      }
    }
    (lawyers.toSeq, firms.toSeq)
  }

  private val parsePartiesUdf = udf(parseMultipleParties _)
  private val parseLawyersUdf = udf((s: String) => parseLawyerSegment(s)._1)
  private val parseFirmsUdf = udf((s: String) => parseLawyerSegment(s)._2)

  /** Records → exploded per-case entity view (cached intermediate). */
  private def entityView(records: DataFrame): DataFrame =
    records.select(
      coalesce(col("case_number"), col("file_name")).as("case_key"),
      col("court_name"), col("judge"),
      parsePartiesUdf(col("plaintiff")).as("plaintiffs"),
      parsePartiesUdf(col("defendant")).as("defendants"),
      parseLawyersUdf(col("lawyer")).as("lawyers"),
      parseFirmsUdf(col("lawyer")).as("firms"))

  /** Nodes: Case, Court, Judge, Plaintiff, Defendant, Lawyer, LawFirm —
    * deduped on (type, name) (`data_importer.py:350-358` semantics). */
  def nodes(records: DataFrame): DataFrame = {
    val ev = entityView(records)
    val cases = ev.select(lit("Case").as("type"), col("case_key").as("name"))
    val courts = ev.filter(col("court_name") =!= "")
      .select(lit("Court").as("type"), col("court_name").as("name"))
    val judges = ev.filter(col("judge") =!= "")
      .select(lit("Judge").as("type"), col("judge").as("name"))
    val plaintiffs = ev.select(explode(col("plaintiffs")).as("name"))
      .select(lit("Plaintiff").as("type"), col("name"))
    val defendants = ev.select(explode(col("defendants")).as("name"))
      .select(lit("Defendant").as("type"), col("name"))
    val lawyers = ev.select(explode(col("lawyers")).as("name"))
      .select(lit("Lawyer").as("type"), col("name"))
    val firms = ev.select(explode(col("firms")).as("name"))
      .select(lit("LawFirm").as("type"), col("name"))
    cases.unionByName(courts).unionByName(judges).unionByName(plaintiffs)
      .unionByName(defendants).unionByName(lawyers).unionByName(firms)
      .dropDuplicates("type", "name")
  }

  /** Edges: HEARD_IN, JUDGED_BY, INVOLVES_PLAINTIFF, INVOLVES_DEFENDANT,
    * and the per-case plaintiff×defendant SUES cross product
    * (`data_importer.py:252-295`) — an equi-join on case_key carrying a
    * local cross product, expressed as explode × explode. */
  def edges(records: DataFrame): DataFrame = {
    val ev = entityView(records).cache()
    val heardIn = ev.filter(col("court_name") =!= "").select(
      lit("Case").as("src_type"), col("case_key").as("src_name"),
      lit("HEARD_IN").as("rel_type"),
      lit("Court").as("dst_type"), col("court_name").as("dst_name"))
    val judgedBy = ev.filter(col("judge") =!= "").select(
      lit("Case").as("src_type"), col("case_key").as("src_name"),
      lit("JUDGED_BY").as("rel_type"),
      lit("Judge").as("dst_type"), col("judge").as("dst_name"))
    val invP = ev.select(col("case_key"), explode(col("plaintiffs")).as("p")).select(
      lit("Case").as("src_type"), col("case_key").as("src_name"),
      lit("INVOLVES_PLAINTIFF").as("rel_type"),
      lit("Plaintiff").as("dst_type"), col("p").as("dst_name"))
    val invD = ev.select(col("case_key"), explode(col("defendants")).as("d")).select(
      lit("Case").as("src_type"), col("case_key").as("src_name"),
      lit("INVOLVES_DEFENDANT").as("rel_type"),
      lit("Defendant").as("dst_type"), col("d").as("dst_name"))
    // SUES: per-case local cross product — both explodes stay on the same
    // row (no join/shuffle needed at all).
    val sues = ev
      .select(col("case_key"), explode(col("plaintiffs")).as("p"), col("defendants"))
      .select(col("p"), explode(col("defendants")).as("d"))
      .select(
        lit("Plaintiff").as("src_type"), col("p").as("src_name"),
        lit("SUES").as("rel_type"),
        lit("Defendant").as("dst_type"), col("d").as("dst_name"))
    heardIn.unionByName(judgedBy).unionByName(invP).unionByName(invD)
      .unionByName(sues)
  }

  /** A7 — node/relationship statistics
    * (`knowledge_graph/graph_database.py:204-238`). */
  def nodeStatistics(nodes: DataFrame): DataFrame =
    nodes.groupBy("type").agg(count(lit(1)).as("count")).orderBy(desc("count"))

  def relationshipStatistics(edges: DataFrame): DataFrame =
    edges.groupBy("rel_type").agg(count(lit(1)).as("count")).orderBy(desc("count"))

  /** J2/W2 — similar-case scoring: self-join + per-case top-10
    * (`knowledge_graph/graph_database.py:240-271`). Similarity =
    * 0.4·[case_type eq] + 0.2·[court eq] + 0.2·[result eq] +
    * 0.2·[|claim−claim| < 1e6].
    *
    * Scale shape: for any threshold > 0.6, case_type equality is a
    * NECESSARY condition — the other three terms sum to at most
    * 0.2+0.2+0.2 = 0.6, so no pair with differing case_type can reach the
    * threshold. The join is therefore a shuffled (or AQE-broadcast, when
    * one side is small — size-based, never forced) EQUI-join on case_type
    * instead of the N² theta cross product. For threshold <= 0.6 the
    * necessary condition doesn't hold and the reference's full pairwise
    * comparison is the semantics, so the theta join is kept on that path
    * (a consumer asking for sub-0.6 similarity is asking for ~all pairs). */
  def similarCases(cases: DataFrame, threshold: Double = 0.7): DataFrame = {
    val a = cases.select(
      col("case_key").as("a_key"), col("case_type").as("a_ct"),
      col("court_name").as("a_court"), col("judgment_result").as("a_jr"),
      col("claim_value").as("a_cv"))
    val b = cases.select(
      col("case_key").as("b_key"), col("case_type").as("b_ct"),
      col("court_name").as("b_court"), col("judgment_result").as("b_jr"),
      col("claim_value").as("b_cv"))

    val sim =
      when(col("a_ct") === col("b_ct"), 0.4).otherwise(0.0) +
      when(col("a_court") === col("b_court"), 0.2).otherwise(0.0) +
      when(col("a_jr") === col("b_jr"), 0.2).otherwise(0.0) +
      when(abs(col("a_cv") - col("b_cv")) < 1000000, 0.2).otherwise(0.0)

    val joined =
      if (threshold > 0.6)
        a.join(b, col("a_ct") === col("b_ct") && col("a_key") =!= col("b_key"))
      else
        a.join(b, col("a_key") =!= col("b_key"))

    val w = Window.partitionBy(col("a_key"))
      .orderBy(desc("similarity"), col("b_key"))
    joined
      .withColumn("similarity", sim)
      .filter(col("similarity") >= threshold)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .drop("rn")
  }
}
