import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// temporary probe (verify skill §2) — measures the centroid pass's share so
// VERDICT item 7 (dim-explode aggregate) can be decided on numbers; DELETED
// before commit.
object CentroidsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "262144")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(n: Int)(f: => Unit): Double = {
      f // warmup
      System.gc()
      val t0 = System.nanoTime(); (0 until n).foreach(_ => f)
      (System.nanoTime() - t0) / 1e9 / n
    }
    val tCent = timed(5)(noop(graft.llm.Ann.centroids(emb, "label")))
    val tScan = timed(5)(noop(emb.select(col("vec_id"), col("embedding"))))
    // explode-only cost: same explode, trivially aggregated
    val tExpl = timed(5)(noop(
      emb.select(col("label").as("cluster"),
          posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "x")))
        .groupBy(col("cluster")).agg(count(lit(1)))))
    println(s"CENTROIDS_PROBE centroids=$tCent scan=$tScan explode_agg=$tExpl rows=${emb.count()}")
    spark.stop()
  }
}
