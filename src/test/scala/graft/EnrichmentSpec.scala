package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{EnrichmentSource, Intel, PtrSource, ShodanSource}

/** The pluggable-connector seam: fixture sources delegate to Intel's joins
  * unchanged, and a connector implemented entirely OUTSIDE the library (as a
  * live whois/DNS/Shodan integration would be) plugs in without touching
  * Intel.scala.
  */
class EnrichmentSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ips: DataFrame = {
    import spark.implicits._
    (1L to 20L).map(e => (e, (e * 2654435761L) % 4294967296L)).toDF("entity", "ip")
  }

  test("fixture sources reproduce the direct Intel joins exactly") {
    import spark.implicits._
    val scanDb = ips.filter($"ip" % 4 === 1)
      .select($"ip", lit("22,80").as("ports"), lit("iot").as("tags"))
    val viaSeam = ShodanSource(scanDb).enrich(ips).orderBy($"entity").collect()
    val direct = Intel.shodanEnrich(ips, scanDb).orderBy($"entity").collect()
    assert(viaSeam.toSeq === direct.toSeq)

    val ptrDb = ips.filter($"entity" % 2 === 0)
      .select($"ip", concat(lit("h"), $"entity", lit(".example.net")).as("hostname"))
    assert(PtrSource(ptrDb).enrich(ips).orderBy($"entity").collect().toSeq ===
      Intel.ptrEnrich(ips, ptrDb).orderBy($"entity").collect().toSeq)
  }

  test("feeds declares EVERY table enrich joins, and each stays feed-sized") {
    import spark.implicits._
    val scanDb = ips.filter($"ip" % 4 === 1)
      .select($"ip", lit("22,80").as("ports"), lit("iot").as("tags"))
    val setLists = ips.filter($"ip" % 5 === 0).select(lit("bl1").as("list_id"), $"ip")
    val prefixLists = Seq(("p1", 0L, 1000000L)).toDF("list_id", "p_start", "p_end")
    val sources = Seq(
      ShodanSource(scanDb),
      graft.sources.RedisBlSource(setLists, prefixLists))
    sources.foreach { src =>
      // the scale contract is checkable across the WHOLE connector: every
      // joined table is declared (RedisBl has two — sets AND prefixes)
      assert(src.feeds.nonEmpty, src.name)
      src.feeds.foreach(f => assert(f.count() <= 1000L, s"${src.name} feed too big"))
    }
    assert(sources.find(_.name == "redis_bl").get.feeds.size == 2)
  }

  test("a connector defined outside the library plugs in through the trait") {
    import spark.implicits._
    // A stand-in for a live integration: the feed is assembled by the
    // connector itself (here programmatically; in production from an API
    // batch), and the engine only ever sees the trait.
    final class FakeLiveGreynoise extends EnrichmentSource {
      val name = "greynoise"
      private def feed: DataFrame =
        (1L to 20L).filter(_ % 3 == 0)
          .map(e => ((e * 2654435761L) % 4294967296L, "scanner"))
          .toDF("ip", "classification")
      def feeds: Seq[DataFrame] = Seq(feed)
      def enrich(entities: DataFrame): DataFrame =
        entities.join(broadcast(feed), Seq("ip"), "left")
          .select(col("entity"), col("ip"),
            coalesce(col("classification"), lit("unknown")).as("classification"))
    }
    val out = new FakeLiveGreynoise().enrich(ips)
    assert(out.count() === 20)
    assert(out.filter($"classification" === "scanner").count() ===
      (1L to 20L).count(_ % 3 == 0))
    // the seam's scale contract: the feed side is broadcast, the entity
    // frame never shuffles for enrichment
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
