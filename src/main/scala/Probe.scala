import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1x100")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "262144")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.llm.Multimodal
    import graft.core.Tables
    def time(name: String)(f: => Unit): Unit = {
      System.gc(); val t0 = System.nanoTime(); f
      println(f"PROBE $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = Tables.documents(spark, sfDir)
    noop(Multimodal.withVideoPayload(docs, codec = "jpeg"))
    time("encode_only_jpeg") { noop(Multimodal.withVideoPayload(docs, codec = "jpeg")) }
    time("encode_only_png") { noop(Multimodal.withVideoPayload(docs)) }
    time("full_mjpeg") { noop(Multimodal.decodeVideo(Multimodal.withVideoPayload(docs, codec = "jpeg"))) }
    spark.stop()
  }
}
