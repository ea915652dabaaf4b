package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape guards for the int8-quantized ANN paths (round-3 verdict #1):
  * the representation that crosses the candidate join must be the int8
  * struct (`array<tinyint>` + scale), with reconstruction to doubles on the
  * probe side only — and the scale paths must generate candidates via an
  * equi-join (bucket/cell), never an all-pairs nested-loop product. */
class AnnPlanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-ann-plan-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  private def isInt8Struct(dt: DataType): Boolean = dt match {
    case st: StructType => st.fields.exists(_.dataType match {
      case ArrayType(ByteType, _) => true
      case _ => false
    })
    case _ => false
  }

  private def isDoubleArray(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def topJoin(df: DataFrame): Join = {
    val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
    assert(joins.nonEmpty, s"expected a join in:\n${df.queryExecution.optimizedPlan}")
    joins.head
  }

  test("quantizedTopK ships the int8 struct on the broadcast candidate side, not dequantized doubles") {
    val df = SparkEntry.queries("q_ann_quantized")(spark, sfDir)
    val j = topJoin(df)
    // candidate (broadcast/right) side: int8 struct present, no double arrays
    assert(j.right.output.map(_.dataType).exists(isInt8Struct),
      s"candidate side must carry struct(maxabs, array<tinyint>):\n${j.right.schema.treeString}")
    assert(!j.right.output.map(_.dataType).exists(isDoubleArray),
      s"candidate side must NOT pre-materialize dequantized doubles:\n${j.right.schema.treeString}")
  }

  test("lshQuantizedTopK: equi-join on bucket, int8 candidate payload, doubles only on the tiny query side") {
    val df = SparkEntry.queries("q_ann_lsh_quantized")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"LSH-quantized plan is a cartesian product:\n$p")
    assert(!p.contains("BroadcastNestedLoop"), s"LSH-quantized plan is a nested-loop join:\n$p")
    val j = topJoin(df)
    val (qSide, cSide) =
      if (j.right.output.map(_.dataType).exists(isInt8Struct)) (j.left, j.right)
      else (j.right, j.left)
    assert(cSide.output.map(_.dataType).exists(isInt8Struct),
      s"no join side carries the int8 struct:\n${df.queryExecution.optimizedPlan}")
    assert(!cSide.output.map(_.dataType).exists(isDoubleArray),
      s"candidate side must not carry double arrays:\n${cSide.schema.treeString}")
    assert(qSide.output.map(_.dataType).count(isDoubleArray) <= 1,
      "query side carries only its own reconstructed vector")
  }

  test("probeIndex: candidate scan is PARTITION-PRUNED on cell and reads only the index") {
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft_annplan_idx").toString
    graft.pipeline.AnnJobs.buildIndex(spark, emb, dir, nlist = 8)
    // queries arrive as the CALLER's rows (a real serving call), not a scan
    // of the corpus table — so every file scan left in the probe plan must
    // be an index read
    val qSel = emb.filter(col("vec_id") < 10).select(col("vec_id"), col("embedding"))
    val queryDf = spark.createDataFrame(
      java.util.Arrays.asList(qSel.collect(): _*), qSel.schema)
    val probe = graft.pipeline.AnnJobs.probeIndex(spark, dir, queryDf,
      k = 5, nprobe = 2)
    val scans = graft.tools.ProbeAnn.fileScans(probe.queryExecution.executedPlan)
    // every scan in the probe plan reads from the index directory — the
    // probe never touches the raw embeddings table (zero training work)
    assert(scans.nonEmpty)
    scans.foreach { f =>
      assert(f.relation.location.rootPaths.forall(_.toString.contains(dir)),
        s"probe scan outside the index: ${f.relation.location.rootPaths}")
    }
    // the vectors scan carries the cell isin() as a PartitionFilter — the
    // cell-partitioned layout prunes unprobed cells at the source
    val vecScan = scans.find(_.relation.location.rootPaths
      .exists(_.toString.contains("vectors")))
    assert(vecScan.isDefined, "no scan over the index vectors table")
    assert(vecScan.get.partitionFilters.exists(_.references.exists(_.name == "cell")),
      s"cell filter must prune partitions, got partitionFilters=" +
        s"${vecScan.get.partitionFilters}")
    // and the payload that crosses the scan is the int8 struct
    assert(vecScan.get.output.map(_.dataType).exists(isInt8Struct),
      s"index vectors scan must emit the int8 struct:\n${vecScan.get.schema.treeString}")
  }

  test("hyperplaneQuantizedTopK: equi-join on bucket, int8 candidate payload") {
    val df = SparkEntry.queries("q_ann_hyperplane_quantized")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"hyperplane plan is a cartesian product:\n$p")
    assert(!p.contains("BroadcastNestedLoop"), s"hyperplane plan is a nested-loop join:\n$p")
    val j = topJoin(df)
    val cSide =
      if (j.right.output.map(_.dataType).exists(isInt8Struct)) j.right else j.left
    assert(cSide.output.map(_.dataType).exists(isInt8Struct),
      s"no join side carries the int8 struct:\n${df.queryExecution.optimizedPlan}")
    assert(!cSide.output.map(_.dataType).exists(isDoubleArray),
      s"candidate side must not carry double arrays:\n${cSide.schema.treeString}")
  }

  test("ivfQuantizedTopK: equi-join on cell, int8 candidate payload") {
    val df = SparkEntry.queries("q_ann_ivf_quantized")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"IVF-quantized plan is a cartesian product:\n$p")
    assert(!p.contains("BroadcastNestedLoop"), s"IVF-quantized plan is a nested-loop join:\n$p")
    val j = topJoin(df)
    val cSide =
      if (j.right.output.map(_.dataType).exists(isInt8Struct)) j.right else j.left
    assert(cSide.output.map(_.dataType).exists(isInt8Struct),
      s"no join side carries the int8 struct:\n${df.queryExecution.optimizedPlan}")
    assert(!cSide.output.map(_.dataType).exists(isDoubleArray),
      s"candidate side must not carry double arrays:\n${cSide.schema.treeString}")
  }
}
