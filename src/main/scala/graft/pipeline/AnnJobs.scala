package graft.pipeline

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.{Vector, Vectors}
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
  * AnnSpec (IVF top-k must overlap brute-force top-k). */
object AnnJobs {

  /** Cosine IVF = L2 IVF on the unit sphere: normalize before training and
    * assignment, else Euclidean cells don't respect cosine neighborhoods. */
  private val toUnitVec = udf((a: Seq[Float]) => {
    val v = a.map(_.toDouble).toArray
    val n = math.sqrt(v.map(x => x * x).sum)
    Vectors.dense(if (n == 0) v else v.map(_ / n))
  })

  private val cosineSim = udf((a: Seq[Float], b: Seq[Float]) => {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    math.rint(dot / (math.sqrt(na) * math.sqrt(nb)) * 10000) / 10000
  })

  /** Assign every embedding to its coarse cell. Returns (assigned, model).
    *
    * The quantizer trains on a bounded sample (`maxTrainRows`): centroid
    * quality needs only a representative sample, and at 100 TB a KMeans
    * `fit` over the full table would iterate the whole corpus maxIter
    * times. Assignment still covers every row. The sample is seeded, so
    * the trained centroids are deterministic for a fixed input. */
  def assign(spark: SparkSession, embeddings: DataFrame, nlist: Int,
             seed: Long = 42L, maxTrainRows: Long = 100000L)
      : (DataFrame, org.apache.spark.ml.clustering.KMeansModel) = {
    val withVec = embeddings.withColumn("features", toUnitVec(col("embedding")))
    val n = withVec.count()
    val train =
      if (n <= maxTrainRows) withVec
      else withVec.sample(withReplacement = false,
        math.min(1.0, maxTrainRows.toDouble * 1.05 / n), seed)
    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(10)
      .fit(train)
    (model.transform(withVec).withColumnRenamed("prediction", "cell"), model)
  }

  /** IVF top-k: queries probe their `nprobe` nearest cells only. */
  def ivfTopK(spark: SparkSession, embeddings: DataFrame, queryIds: Column,
              k: Int = 5, nlist: Int = 8, nprobe: Int = 2,
              maxTrainRows: Long = 100000L): DataFrame = {
    val (assigned, model) = assign(spark, embeddings, nlist, maxTrainRows = maxTrainRows)
    val centroids = model.clusterCenters

    val nearestCells = udf((a: Seq[Float]) => {
      val raw = a.map(_.toDouble).toArray
      val norm = math.sqrt(raw.map(x => x * x).sum)
      val v = if (norm == 0) raw else raw.map(_ / norm)
      centroids.zipWithIndex.map { case (c, i) =>
        var d = 0.0
        var j = 0
        val ca = c.toArray
        while (j < v.length) { val t = v(j) - ca(j); d += t * t; j += 1 }
        (i, d)
      }.sortBy(x => (x._2, x._1)).take(nprobe).map(_._1)
    })

    val queries = assigned.filter(queryIds)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        explode(nearestCells(col("embedding"))).as("cell"))
    val candidates = assigned
      .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"), col("cell"))

    val w = Window.partitionBy(col("q_id")).orderBy(desc("sim"), col("n_id"))
    queries.join(candidates, Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim", cosineSim(col("q_emb"), col("n_emb")))
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
      .withColumn("sim", cosineSim(col("q_emb"), col("n_emb")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("n_id"), col("sim"), col("rn"))
      .orderBy(col("q_id"), col("rn"))
  }
}
