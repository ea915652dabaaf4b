package graft.pipeline

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
  * arrays) — no Scala UDF anywhere, so the scan, the cell join and the
  * cosine ranking all stay inside whole-stage codegen. Centroid training
  * itself is a bounded DRIVER-LOCAL Lloyd's k-means over a deterministic
  * hash-top-k sample ([[lloyd]]/[[assign]]): index-time work that costs one
  * corpus pass, never an iterative cluster-side fit. */
object AnnJobs {

  /** Exact dot product of two float/double-array columns as doubles —
    * the native [[graft.plans.VecDotExpr]] kernel, bit-identical
    * (fold-left in index order from 0.0, float→double exact widening)
    * to the `aggregate(zip_with(...))` composed form it replaced, which
    * ran INTERPRETED with a lambda dispatch per element. Registers on
    * the active/default session so callers need no prior register()
    * (the LmQuality.trigramList discipline). */
  private def dot(x: Column, y: Column): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .foreach(graft.plans.VecExprs.register)
    graft.plans.VecExprs.vec_dot(x, y)
  }

  /** Let-binding for Column expressions: evaluate `v` ONCE per row and
    * reference the bound value from `body`. Spark's higher-order builtins
    * (`transform`/`zip_with`/`aggregate`) run INTERPRETED and re-evaluate
    * any sub-expression embedded in a lambda once per array element — an
    * O(dim) reduction nested inside a per-element lambda silently becomes
    * O(dim²) per row (measured: 14-106 s to evaluate nearestCells over a
    * 2,000-row table before this binding, milliseconds after). */
  private def letD(v: Column)(body: Column => Column): Column =
    element_at(transform(array(v), x => body(x)), 1)

  /** Cosine similarity rounded to 4dp — same rounding as the oracle-checked
    * q_ann_cosine, so brute force and IVF rank identically. */
  private def cosine(a: Column, b: Column): Column =
    round(dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b))), 4)

  /** The `nprobe` nearest centroids of `emb` (unit-normalized — cosine IVF
    * = L2 IVF on the unit sphere), as an array of cell indices ordered by
    * squared distance with a lowest-index tiebreak. Centroids are folded in
    * as a LITERAL array of (index, |c|², coords) structs.
    *
    * Uses the expansion d²(x/|x|, c) = 1 + |c|² - 2·(x·c)/|x|: the |x|
    * norm is computed ONCE per row (via [[letD]] — nesting it in the
    * per-centroid lambda would re-evaluate the O(dim) reduction per
    * centroid), each centroid then costs one O(dim) dot product, and the
    * constant 1 is dropped since it doesn't affect the argsort. A zero
    * vector scores |c|² (its "unit" form is the zero vector). */
  private def nearestCells(emb: Column, centroids: Array[Array[Double]],
                           nprobe: Int): Column = {
    val centLit = array(centroids.zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("i"), lit(c.map(x => x * x).sum).as("c2"),
        array(c.map(lit(_)): _*).as("c"))
    }: _*)
    letD(sqrt(dot(emb, emb))) { nrm =>
      // struct(d, i) sorts lexicographically: score first, index tiebreak
      val dists = transform(centLit, s => struct(
        when(nrm === 0.0, s.getField("c2"))
          .otherwise(s.getField("c2") -
            lit(2.0) * dot(emb, s.getField("c")) / nrm)
          .as("d"),
        s.getField("i").as("i")))
      transform(slice(array_sort(dists), 1, nprobe), s => s.getField("i"))
    }
  }

  /** Driver-local Lloyd's k-means with seeded k-means++ init — the coarse
    * quantizer trainer. Deterministic for a fixed (sample, k, seed); ties
    * in the assignment argmin break to the lowest centroid index, the same
    * order [[nearestCells]] uses, so training and full-corpus assignment
    * agree. Empty clusters keep their previous center. */
  private[pipeline] def lloyd(xs: Array[Array[Double]], k: Int, seed: Long,
                              maxIter: Int = 10): Array[Array[Double]] = {
    require(xs.nonEmpty, "cannot train a quantizer on an empty sample")
    val dim = xs.head.length
    val rnd = new scala.util.Random(seed)
    val n = xs.length
    // k-means++ seeding: first center uniform, then proportional to the
    // squared distance to the nearest chosen center
    val centers = Array.ofDim[Array[Double]](k)
    centers(0) = xs(rnd.nextInt(n)).clone()
    val d2 = Array.fill(n)(Double.MaxValue)
    def sq(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    var c = 1
    while (c < k) {
      var i = 0
      var tot = 0.0
      while (i < n) {
        val d = sq(xs(i), centers(c - 1))
        if (d < d2(i)) d2(i) = d
        tot += d2(i); i += 1
      }
      if (tot == 0.0) centers(c) = xs(rnd.nextInt(n)).clone() // all points covered
      else {
        var r = rnd.nextDouble() * tot
        var j = 0
        while (j < n - 1 && r >= d2(j)) { r -= d2(j); j += 1 }
        centers(c) = xs(j).clone()
      }
      c += 1
    }
    // Lloyd iterations: nearest-center assignment (lowest index on ties),
    // mean recompute; stop early when no point moves
    val assign = Array.fill(n)(-1)
    var iter = 0
    var moved = true
    while (iter < maxIter && moved) {
      moved = false
      var i = 0
      while (i < n) {
        var best = 0; var bestD = sq(xs(i), centers(0))
        var j = 1
        while (j < k) {
          val d = sq(xs(i), centers(j))
          if (d < bestD) { bestD = d; best = j }
          j += 1
        }
        if (best != assign(i)) { assign(i) = best; moved = true }
        i += 1
      }
      if (moved) {
        val sums = Array.fill(k)(new Array[Double](dim))
        val counts = new Array[Int](k)
        i = 0
        while (i < n) {
          val a = assign(i); counts(a) += 1
          var d = 0
          while (d < dim) { sums(a)(d) += xs(i)(d); d += 1 }
          i += 1
        }
        var j = 0
        while (j < k) {
          if (counts(j) > 0) {
            var d = 0
            while (d < dim) { sums(j)(d) /= counts(j); d += 1 }
            centers(j) = sums(j)
          } // empty cluster: keep the previous center
          j += 1
        }
      }
      iter += 1
    }
    centers
  }

  /** Train the coarse quantizer and assign every embedding to its nearest
    * cell. Returns (assigned, centroids).
    *
    * The quantizer trains DRIVER-LOCALLY on a bounded deterministic sample:
    * the `maxTrainRows` hash-smallest `vec_id`s, fetched by a distributed
    * top-k (`TakeOrderedAndProject` — ONE corpus pass, no `count()`), then
    * [[lloyd]] over ≤100k unit vectors in driver memory (≤~50 MB at
    * 64 dims). Centroid quality needs only a representative sample, and at
    * 100 TB an iterative cluster-side fit would re-scan the corpus every
    * iteration and serialize the job queue on index builds — index-time
    * training is a bounded driver computation by design. Assignment still
    * covers every row — via the builtin [[nearestCells]] argmin over the
    * trained centroids (exact squared distance, lowest index on ties,
    * matching [[lloyd]]'s order), so the full-corpus pass carries no UDF
    * anywhere. Deterministic for a fixed input and seed. */
  def assign(spark: SparkSession, embeddings: DataFrame, nlist: Int,
             seed: Long = 42L, maxTrainRows: Long = 100000L)
      : (DataFrame, Array[Array[Double]]) = {
    require(maxTrainRows > 0 && maxTrainRows <= 1000000L,
      s"driver-local training sample must be bounded, got $maxTrainRows")
    val sample: Array[Array[Double]] = embeddings
      .select(col("vec_id"), col("embedding"))
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(maxTrainRows.toInt)
      .select(col("embedding")).collect()
      .map { r =>
        val v = r.getSeq[Float](0).iterator.map(_.toDouble).toArray
        val nrm = math.sqrt(v.iterator.map(x => x * x).sum)
        if (nrm == 0) v else v.map(_ / nrm) // unit: cosine cells = L2 cells
      }
    val centroids = lloyd(sample, nlist, seed)
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
      // no dedup shuffle needed: each corpus vector is assigned exactly ONE
      // cell, so a (q_id, n_id) pair can match at most once
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
    // maxabs is bound via letD: referenced from inside the per-element
    // quantization lambda, it would otherwise re-run its O(dim) array_max
    // per element (interpreted higher-order functions re-evaluate embedded
    // sub-expressions — see letD)
    letD(array_max(transform(demb, x => abs(x)))) { maxabs =>
      struct(
        maxabs.as("maxabs"),
        when(maxabs === 0.0, transform(demb, _ => lit(0).cast("tinyint")))
          .otherwise(transform(demb, x =>
            round(x * lit(127.0) / maxabs).cast("tinyint")))
          .as("q"))
    }
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

  /** Shared body of the bucketed int8 paths: `qz` is (vec_id, bucket, qs);
    * candidates carry only `(n_id, bucket, int8 struct)` — 1 byte/dim
    * through the bucket equi-join — and are reconstructed on the probe side
    * for the exact cosine ranking within the bucket. */
  private def bucketedQuantizedTopK(qz: DataFrame, queryIds: Column,
                                    k: Int): DataFrame = {
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

  /** The quantized SCALE path over LSH candidates: bucket on the sign bits
    * of the original vector (computed at index time). Same
    * bucket/rounding/tiebreak as q_ann_lsh_topk, so the full pipeline is
    * DuckDB-expressible and oracle-checked (q_ann_lsh_quantized). */
  def lshQuantizedTopK(embeddings: DataFrame, queryIds: Column,
                       k: Int = 3, nBits: Int = 8): DataFrame =
    bucketedQuantizedTopK(
      embeddings.select(col("vec_id"),
        signBucket(col("embedding"), nBits).as("bucket"),
        int8Quantize(col("embedding")).as("qs")),
      queryIds, k)

  /** Seeded ±1 (Rademacher) hyperplane matrix for random-hyperplane sign
    * LSH (Charikar 2002; ±1 entries as in SimHash-style constructions).
    * Deterministic for a fixed (dim, nBits, seed); the same literal matrix
    * is folded into the DuckDB oracle, so the bucketing is replayable in
    * SQL. ±1 entries keep every term of the projection exactly
    * representable — the engine/oracle sign comparison can only diverge on
    * a dot product within float-summation noise of exactly 0. */
  def hyperplanes(dim: Int, nBits: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nBits, dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  /** Bucket = sign bits of the projections onto `planes`. Unlike
    * [[signBucket]] (the first-nBits-dims special case), random hyperplanes
    * mix EVERY dimension into each bit, so corpora whose energy
    * concentrates in a few (or correlated) leading dimensions still spread
    * across 2^nBits buckets instead of collapsing into two. */
  def hyperplaneBucket(emb: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(emb, array(p.map(lit(_)): _*)) > 0, 1 << i).otherwise(0)
    }.reduce(_ + _)

  /** [[lshQuantizedTopK]] with RANDOM-HYPERPLANE buckets (round-4 verdict
    * #5): same candidate/join/rank shape, but recall is robust to
    * distributions where axis-aligned sign bits degenerate (AnnSpec pins
    * this on a correlated-dims fixture). Fully DuckDB-expressible — the
    * oracle bakes the identical seeded matrix into SQL. */
  def hyperplaneQuantizedTopK(embeddings: DataFrame, queryIds: Column,
                              dim: Int, k: Int = 3, nBits: Int = 8,
                              seed: Long = 7L): DataFrame =
    bucketedQuantizedTopK(
      embeddings.select(col("vec_id"),
        hyperplaneBucket(col("embedding"), hyperplanes(dim, nBits, seed)).as("bucket"),
        int8Quantize(col("embedding")).as("qs")),
      queryIds, k)

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
      // no dedup shuffle needed: each corpus vector is assigned exactly ONE
      // cell, so a (q_id, n_id) pair can match at most once
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("n_id"), col("sim"), col("rn"))
      .orderBy(col("q_id"), col("rn"))
  }

  /** Build a PERSISTED IVF index (round-4 verdict #2): at 100 TB the index
    * is built once and probed many times — the fused [[ivfQuantizedTopK]]
    * retrains the quantizer and re-assigns the corpus per call, which is
    * the right shape for a self-contained oracle query but not for serving.
    * Writes two parquet tables under `dir`:
    *  - `centroids`: (cell int, centroid array<double>) — nlist rows, the
    *    coarse quantizer;
    *  - `vectors`: (vec_id, qs int8-struct) HIVE-PARTITIONED BY `cell` —
    *    the corpus payload is 1 byte/dim on disk, and the partition layout
    *    means a probe's cell filter prunes whole directories: a probe scans
    *    ~nprobe/nlist of the index, never the unprobed cells. */
  def buildIndex(spark: SparkSession, embeddings: DataFrame, dir: String,
                 nlist: Int = 8, seed: Long = 42L,
                 maxTrainRows: Long = 100000L): Unit = {
    val (assigned, centroids) = assign(spark, embeddings, nlist, seed, maxTrainRows)
    import spark.implicits._
    centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    assigned
      .select(col("vec_id"), int8Quantize(col("embedding")).as("qs"), col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$dir/vectors")
  }

  /** Probe a prebuilt index with ZERO training work: centroids come from
    * the persisted nlist-row table (one bounded driver read), the corpus
    * from the cell-partitioned vectors table behind an `isin(probed cells)`
    * filter — a PartitionFilter, so unprobed cells are never scanned
    * (AnnPlanSpec pins the plan shape; ProbeAnn demonstrates the job
    * profile). Queries arrive as full-precision (vec_id, embedding) rows —
    * a caller's own vectors, as in a real ANN service; ranking quantizes
    * and reconstructs the query exactly as the fused path does, so
    * probeIndex(buildIndex(E), Q⊆E) row-equals ivfQuantizedTopK(E, Q)
    * (AnnSpec pins the equality). */
  def probeIndex(spark: SparkSession, dir: String, queries: DataFrame,
                 k: Int = 5, nprobe: Int = 2): DataFrame = {
    val centroids: Array[Array[Double]] = spark.read.parquet(s"$dir/centroids")
      .orderBy(col("cell")).collect()
      .map(_.getSeq[Double](1).toArray)
    // two projections: the struct's field names only finalize at a
    // projection boundary (a direct dequantize∘quantize composition fails
    // getField resolution inside the letD lambda)
    val q0 = queries.select(col("vec_id").as("q_id"),
      int8Quantize(col("embedding")).as("qqs"), col("embedding"))
    val q = q0.select(col("q_id"),
      int8Dequantize(col("qqs")).as("q_emb"),
      explode(nearestCells(col("embedding"), centroids, nprobe)).as("cell"))
    // Bounded driver-side read: the distinct probed cells — at most nlist
    // ints regardless of query count — is what turns the candidate scan
    // into a partition-pruned read instead of a full-index join.
    val cells = q.select(col("cell")).distinct().collect().map(_.getInt(0))
    val candidates = spark.read.parquet(s"$dir/vectors")
      .filter(col("cell").isin(cells.map(Integer.valueOf): _*))
      .select(col("vec_id").as("n_id"), col("qs").as("n_qs"), col("cell"))
    val w = Window.partitionBy(col("q_id")).orderBy(desc("sim"), col("n_id"))
    q.join(candidates, Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("n_emb", int8Dequantize(col("n_qs")))
      .withColumn("sim", cosine(col("q_emb"), col("n_emb")))
      // no dedup shuffle needed: each corpus vector is assigned exactly ONE
      // cell, so a (q_id, n_id) pair can match at most once
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
