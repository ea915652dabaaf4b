package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary diagnostic: stage-by-stage timing of the IVF ANN path. */
object ProbeAnn {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000).selectExpr("sum(id)").collect()
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    t("read.count")(emb.count())

    val (assigned, cents) = t("assign-construct") {
      graft.pipeline.AnnJobs.assign(spark, emb, nlist = 8)
    }
    t("assigned-noop")(noop(assigned))
    t("assigned-noop2")(noop(assigned))

    val full = t("ivf-construct") {
      graft.pipeline.AnnJobs.ivfTopK(spark, emb, col("vec_id") < 10, k = 5,
        nlist = 8, nprobe = 2)
    }
    t("ivf-noop")(noop(full))
    t("ivf-noop2")(noop(full))

    val fullQ = t("ivfq-construct") {
      graft.pipeline.AnnJobs.ivfQuantizedTopK(spark, emb, col("vec_id") < 10,
        k = 5, nlist = 8, nprobe = 2)
    }
    t("ivfq-noop")(noop(fullQ))
    spark.stop()
  }
}
