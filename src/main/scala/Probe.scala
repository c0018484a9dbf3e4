import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("probe-ivf").toString
    val emb = graft.core.Tables.embeddings(spark, sf)
    graft.llm.Ann.writeIvfIndex(emb, clusterCol = "label", dir = dir)
    val q = emb.filter(col("vec_id") < 2)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val probed = graft.llm.Ann.ivfTopKPruned(q, dir, k = 3, nprobe = 1)
    probed.collect()
    def scans(pl: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = pl match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scans(qs.plan)
      case s: org.apache.spark.sql.execution.FileSourceScanExec
        if s.metadata.get("Location").exists(_.contains("corpus")) => Seq(s)
      case other => other.children.flatMap(scans)
    }
    val s = scans(probed.queryExecution.executedPlan).head
    println("MARKER metrics: " + s.metrics.map { case (k, m) => s"$k=${m.value}" }.toSeq.sorted.mkString(", "))
    println("MARKER scanstr: " + s.toString.take(800))
    println("MARKER final: " + probed.queryExecution.executedPlan.toString.take(200))
    spark.stop()
  }
}
