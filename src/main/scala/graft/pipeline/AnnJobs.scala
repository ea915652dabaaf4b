package graft.pipeline

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-style approximate nearest neighbour over an embedding column — the
  * scale path beyond the axis-aligned LSH buckets in SparkEntry:
  *
  *  1. a KMeans coarse quantizer (nlist centroids, fixed seed) partitions
  *     the vector space;
  *  2. every vector is assigned to its nearest centroid (the inverted
  *     lists — at scale this is the partitioning/bucketing key of the
  *     vector table, so a probe touches nprobe/nlist of the data);
  *  3. queries scan only their nprobe nearest lists and rank candidates by
  *     exact cosine.
  *
  * Recall/latency trade is controlled by (nlist, nprobe). Deterministic for
  * a fixed seed and input, but centroid training is not expressible in
  * DuckDB — covered by the rows-only check plus the recall test in
  * AnnSpec (IVF top-k must overlap brute-force top-k).
  *
  * Everything on the assignment/probe/rank path is built from codegen'd
  * builtins (`zip_with`/`aggregate`/`array_sort` over literal centroid
  * arrays) — no Scala UDF anywhere in the hot path, so the scan, the cell
  * join and the cosine ranking all stay inside whole-stage codegen. The only
  * UDF left wraps vectors for the BOUNDED KMeans training sample (ML's
  * VectorUDT has no expression constructor), which is off the hot path by
  * construction. */
object AnnJobs {

  /** Exact dot product of two float-array columns as doubles. */
  private def dot(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (a, b) => a.cast("double") * b.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Cosine similarity rounded to 4dp — same rounding as the oracle-checked
    * q_ann_cosine, so brute force and IVF rank identically. */
  private def cosine(a: Column, b: Column): Column =
    round(dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b))), 4)

  /** The `nprobe` nearest centroids of `emb` (unit-normalized — cosine IVF
    * = L2 IVF on the unit sphere), as an array of cell indices ordered by
    * squared distance with a lowest-index tiebreak. Centroids are folded in
    * as a LITERAL array of (index, coords) structs: the whole computation
    * is builtins, evaluated per row inside codegen. */
  private def nearestCells(emb: Column, centroids: Array[Array[Double]],
                           nprobe: Int): Column = {
    val nrm = sqrt(dot(emb, emb))
    val unit = transform(emb, x =>
      when(nrm === 0.0, x.cast("double")).otherwise(x.cast("double") / nrm))
    val centLit = array(centroids.zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("i"), array(c.map(lit(_)): _*).as("c"))
    }: _*)
    // struct(d, i) sorts lexicographically: distance first, index tiebreak
    val dists = transform(centLit, s => struct(
      aggregate(zip_with(unit, s.getField("c"), (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, v) => acc + v).as("d"),
      s.getField("i").as("i")))
    transform(slice(array_sort(dists), 1, nprobe), s => s.getField("i"))
  }

  /** Train the coarse quantizer and assign every embedding to its nearest
    * cell. Returns (assigned, centroids).
    *
    * The quantizer trains on a bounded sample (`maxTrainRows`): centroid
    * quality needs only a representative sample, and at 100 TB a KMeans
    * `fit` over the full table would iterate the whole corpus maxIter
    * times. Assignment still covers every row — via the builtin
    * [[nearestCells]] argmin over the trained centroids (exact squared
    * distance, lowest index on ties, matching ML's `findClosest` order),
    * not `model.transform`, so the full-corpus pass carries no UDF. The
    * sample is seeded, so centroids are deterministic for a fixed input. */
  def assign(spark: SparkSession, embeddings: DataFrame, nlist: Int,
             seed: Long = 42L, maxTrainRows: Long = 100000L)
      : (DataFrame, Array[Array[Double]]) = {
    // Vector wrapping only for the bounded training sample (VectorUDT needs
    // a UDF); normalize first — Euclidean cells must respect cosine
    // neighborhoods.
    val toUnitVec = udf((a: Seq[Float]) => {
      val v = a.map(_.toDouble).toArray
      val n = math.sqrt(v.map(x => x * x).sum)
      Vectors.dense(if (n == 0) v else v.map(_ / n))
    })
    val n = embeddings.count()
    val sampled =
      if (n <= maxTrainRows) embeddings
      else embeddings.sample(withReplacement = false,
        math.min(1.0, maxTrainRows.toDouble * 1.05 / n), seed)
    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(10)
      .fit(sampled.withColumn("features", toUnitVec(col("embedding"))))
    val centroids = model.clusterCenters.map(_.toArray)
    val assigned = embeddings.withColumn("cell",
      element_at(nearestCells(col("embedding"), centroids, 1), 1))
    (assigned, centroids)
  }

  /** IVF top-k: queries probe their `nprobe` nearest cells only. */
  def ivfTopK(spark: SparkSession, embeddings: DataFrame, queryIds: Column,
              k: Int = 5, nlist: Int = 8, nprobe: Int = 2,
              maxTrainRows: Long = 100000L): DataFrame = {
    val (assigned, centroids) = assign(spark, embeddings, nlist, maxTrainRows = maxTrainRows)

    val queries = assigned.filter(queryIds)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        explode(nearestCells(col("embedding"), centroids, nprobe)).as("cell"))
    val candidates = assigned
      .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"), col("cell"))

    val w = Window.partitionBy(col("q_id")).orderBy(desc("sim"), col("n_id"))
    queries.join(candidates, Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim", cosine(col("q_emb"), col("n_emb")))
      .dropDuplicates("q_id", "n_id") // a candidate may appear via 2 cells
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("n_id"), col("sim"), col("rn"))
      .orderBy(col("q_id"), col("rn"))
  }

  /** Int8 max-abs (symmetric) quantization of a float-vector column:
    * `struct(maxabs double, q array<tinyint>)` with
    * q_i = round(x_i * 127 / max|x|). One byte per dimension instead of
    * four — at 100 TB of embeddings this is the difference between a
    * vector table that fits executor memory for the ANN join and one that
    * doesn't (64-dim: 64 B + one scale vs 256 B per vector). Pure per-row
    * builtins, stays in codegen; zero vectors quantize to all-zeros. */
  def int8Quantize(emb: Column): Column = {
    val demb = transform(emb, x => x.cast("double"))
    val maxabs = array_max(transform(demb, x => abs(x)))
    struct(
      maxabs.as("maxabs"),
      when(maxabs === 0.0, transform(demb, _ => lit(0).cast("tinyint")))
        .otherwise(transform(demb, x =>
          round(x * lit(127.0) / maxabs).cast("tinyint")))
        .as("q"))
  }

  /** Reconstruct doubles from [[int8Quantize]] output: q_i * maxabs / 127.
    * Element-wise reconstruction error is bounded by maxabs/254. */
  def int8Dequantize(qs: Column): Column = {
    val maxabs = qs.getField("maxabs")
    when(maxabs === 0.0, transform(qs.getField("q"), _ => lit(0.0)))
      .otherwise(transform(qs.getField("q"), q =>
        q.cast("double") * maxabs / lit(127.0)))
  }

  /** All-pairs top-k over int8-quantized vectors — the labeled BRUTE-FORCE
    * BASELINE for measuring quantization recall, exactly as
    * [[bruteForceTopK]] is the baseline for the bucketed paths; the scale
    * paths that a 100-TB deployment runs are [[lshQuantizedTopK]] and
    * [[ivfQuantizedTopK]] below (equi-join on bucket/cell, never all-pairs).
    *
    * What crosses the broadcast here is the int8 representation itself —
    * `struct(maxabs double, q array<tinyint>)`, 1 byte/dim plus one scale —
    * and reconstruction to doubles happens on the PROBE side, in the
    * projection above the join, so the memory rationale of quantization
    * holds end-to-end (Catalyst does not push non-pruning projections below
    * a join; AnnPlanSpec pins the broadcast side's `array<tinyint>`
    * schema). Same rounding and tiebreak as [[bruteForceTopK]], so recall
    * vs the exact ranking is directly measurable (AnnSpec). */
  def quantizedTopK(embeddings: DataFrame, queryIds: Column,
                    k: Int = 5): DataFrame = {
    val qz = embeddings.select(col("vec_id"), int8Quantize(col("embedding")).as("qs"))
    val q = qz.filter(queryIds)
      .select(col("vec_id").as("q_id"), int8Dequantize(col("qs")).as("q_emb"))
    val c = qz.select(col("vec_id").as("n_id"), col("qs").as("n_qs"))
    val w = Window.partitionBy(col("q_id")).orderBy(desc("sim"), col("n_id"))
    q.join(broadcast(c), col("q_id") =!= col("n_id"))
      .withColumn("n_emb", int8Dequantize(col("n_qs")))
      .withColumn("sim", cosine(col("q_emb"), col("n_emb")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("n_id"), col("sim"), col("rn"))
      .orderBy(col("q_id"), col("rn"))
  }

  /** Sign-LSH bucket of the first `nBits` dimensions — identical to the
    * oracle-checked q_ann_lsh_bucket/q_ann_lsh_topk keying, factored here
    * so the quantized path composes with the same candidate generation. */
  def signBucket(emb: Column, nBits: Int = 8): Column =
    (1 to nBits).map(i =>
      when(element_at(emb, i) > 0, 1 << (i - 1)).otherwise(0)).reduce(_ + _)

  /** The quantized SCALE path over LSH candidates: bucket on the sign bits
    * of the original vector (computed at index time), candidates carry only
    * `(n_id, bucket, int8 struct)` — 1 byte/dim through the bucket
    * equi-join — and are reconstructed on the probe side for the exact
    * cosine ranking within the bucket. Same bucket/rounding/tiebreak as
    * q_ann_lsh_topk, so the full pipeline is DuckDB-expressible and
    * oracle-checked (q_ann_lsh_quantized). */
  def lshQuantizedTopK(embeddings: DataFrame, queryIds: Column,
                       k: Int = 3, nBits: Int = 8): DataFrame = {
    val qz = embeddings.select(col("vec_id"),
      signBucket(col("embedding"), nBits).as("bucket"),
      int8Quantize(col("embedding")).as("qs"))
    val q = qz.filter(queryIds)
      .select(col("vec_id").as("q_id"), col("bucket"),
        int8Dequantize(col("qs")).as("q_emb"))
    val c = qz.select(col("vec_id").as("n_id"), col("bucket"), col("qs").as("n_qs"))
    val w = Window.partitionBy(col("q_id")).orderBy(desc("sim"), col("n_id"))
    q.join(c, Seq("bucket"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("n_emb", int8Dequantize(col("n_qs")))
      .withColumn("sim", cosine(col("q_emb"), col("n_emb")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("bucket"), col("n_id"), col("sim"), col("rn"))
      .orderBy(col("q_id"), col("rn"))
  }

  /** The quantized scale path over IVF candidates — what a real 100-TB
    * deployment runs: cell assignment and probing use the original vectors
    * (index-time work, bounded KMeans sample), while the corpus payload
    * that flows through the cell equi-join is the int8 struct, 1 byte/dim.
    * Ranking reconstructs doubles on the probe side. Covered rows-only
    * (KMeans is not DuckDB-expressible) + AnnSpec recall vs brute force. */
  def ivfQuantizedTopK(spark: SparkSession, embeddings: DataFrame,
                       queryIds: Column, k: Int = 5, nlist: Int = 8,
                       nprobe: Int = 2, maxTrainRows: Long = 100000L): DataFrame = {
    val (assigned, centroids) = assign(spark, embeddings, nlist, maxTrainRows = maxTrainRows)
    val qz = assigned.withColumn("qs", int8Quantize(col("embedding")))
    val queries = qz.filter(queryIds)
      .select(col("vec_id").as("q_id"), int8Dequantize(col("qs")).as("q_emb"),
        explode(nearestCells(col("embedding"), centroids, nprobe)).as("cell"))
    val candidates = qz.select(col("vec_id").as("n_id"), col("qs").as("n_qs"), col("cell"))
    val w = Window.partitionBy(col("q_id")).orderBy(desc("sim"), col("n_id"))
    queries.join(candidates, Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("n_emb", int8Dequantize(col("n_qs")))
      .withColumn("sim", cosine(col("q_emb"), col("n_emb")))
      .dropDuplicates("q_id", "n_id") // a candidate may appear via 2 cells
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("n_id"), col("sim"), col("rn"))
      .orderBy(col("q_id"), col("rn"))
  }

  /** Brute-force baseline (same cosine rounding) for recall measurement. */
  def bruteForceTopK(spark: SparkSession, embeddings: DataFrame,
                     queryIds: Column, k: Int = 5): DataFrame = {
    val q = embeddings.filter(queryIds)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val c = embeddings.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
    val w = Window.partitionBy(col("q_id")).orderBy(desc("sim"), col("n_id"))
    q.join(broadcast(c), col("q_id") =!= col("n_id"))
      .withColumn("sim", cosine(col("q_emb"), col("n_emb")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("n_id"), col("sim"), col("rn"))
      .orderBy(col("q_id"), col("rn"))
  }
}
