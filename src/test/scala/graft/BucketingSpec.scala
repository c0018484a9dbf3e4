package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing evidence: the 100-TB plan for repeated entity-keyed joins
  * (snapshot ⋈ snapshot, snapshot ⋈ event aggregates) is to store both sides
  * bucketed by the entity key, so the join needs NO exchange on either side.
  * This suite actually writes bucketed tables and pins the exchange-free
  * plan — the claim in README's scale notes, made checkable.
  */
class BucketingSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.warehouse.dir",
      Files.createTempDirectory("graft-warehouse").toString)
    .getOrCreate()

  test("entity-bucketed tables sort-merge join with zero exchange") {
    val snap = graft.derive.Derive.snapshot(
        graft.core.Tables.events(spark, sf), "2024-01-29")
      .select(col("entity"), col("rep"), col("total30"))
    def save(name: String): Unit = {
      // the session race decides which suite's warehouse config wins, and a
      // killed JVM leaves table DIRECTORIES behind with no catalog entry —
      // overwrite can't replace a location the catalog doesn't own, so clear
      // both the entry and any stale location before writing
      spark.sql(s"DROP TABLE IF EXISTS $name")
      val loc = new java.io.File(
        new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath, name)
      def rm(f: java.io.File): Unit = {
        // listFiles() is null on I/O error — don't turn a cleanup hiccup
        // into an NPE that pre-empts the actual assertion
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rm)
        f.delete(); ()
      }
      if (loc.exists()) rm(loc)
      snap.write.bucketBy(8, "entity").sortBy("entity")
        .mode("overwrite").format("parquet").saveAsTable(name)
    }
    save("graft_bl_a")
    save("graft_bl_b")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // forbid broadcast so the join must co-locate on the bucket layout
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("graft_bl_a").as("a")
        .join(spark.table("graft_bl_b").as("b"), "entity")
        .select(col("entity"), col("a.rep"), col("b.total30"))
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange"), s"bucketed join still shuffles:\n$p")
      assert(j.count() == snap.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed scan co-locates the entity aggregation too") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val agg = spark.table("graft_bl_a")
        .groupBy(col("entity")).agg(max(col("rep")).as("mx"))
      val p = agg.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"entity agg over bucketed layout shuffles:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
