package graft.ingest

import java.time.{Instant, ZoneOffset}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.fold.{EntityFold, TypedTask}
import graft.ops.UpdateAlgebra._

/** Derives update tasks from the `events` stream table, the analogue of the
  * reference's alert-ingest op derivation (`NERDd/warden_receiver.py:551–578`):
  * per alert it issues `array_upsert events{date,cat} [add n, add conns]`,
  * `add events_meta.total`, `setmax last_activity`, and a `setmax`-merged TTL
  * token (`:555–563`).
  *
  * Table mapping: entity = `user_id`, category = `event_type`, conns =
  * `value`, detect time = `ts`.
  */
/** One normalized alert row. Top-level (not nested/private) because Spark's
  * generated deserializer (`SpecificSafeProjection`) must instantiate it.
  */
case class Ev(event_id: Long, epoch: Long, user_id: Long, event_type: String, value: Double)

object EventTasks {
  val TtlWardenSecs: Long = 14L * 86400 // record_life_length.warden (etc/nerd.yml)

  private val utc = ZoneOffset.UTC

  private def dateStr(epochSec: Long): String =
    Instant.ofEpochSecond(epochSec).atZone(utc).toLocalDate.toString

  private def toEv(events: DataFrame): Dataset[Ev] = {
    import events.sparkSession.implicits._
    events
      .select($"event_id", unix_timestamp($"ts").as("epoch"), $"user_id", $"event_type", $"value")
      .as[Ev]
  }

  /** One task per raw event — the faithful per-alert derivation. Ops stay
    * typed end-to-end (`TypedTask`); the JSON wire codec is reserved for
    * genuinely external task sources (VERDICT r1 #4: no intra-job round-trip).
    */
  def tasks(events: DataFrame): Dataset[TypedTask] = {
    implicit val enc = EntityFold.typedTaskEncoder
    toEv(events).map { e =>
      val d = dateStr(e.epoch)
      val ops = Seq(
        ArrayUpsert("events", Seq("date" -> d, "cat" -> e.event_type),
          Seq(AddNum("n", 1L), AddNum("conns", e.value))),
        AddNum("events_meta.total", 1L),
        AddToSet("events_meta.types", e.event_type),
        SetMax("last_activity", e.epoch),
        SetMax("_ttl.warden", e.epoch + TtlWardenSecs))
      TypedTask("ip", e.user_id, e.event_id, "warden_receiver", ops)
    }
  }

  /** Pre-aggregated variant: one task per (entity, day, category). All ingest
    * ops are commutative-monoid ops (`add`, `setmax`, `add_to_set`), so a
    * relational pre-aggregation (map-side combine before the fold's shuffle)
    * produces identical records while bounding per-key work — this is what
    * keeps one hot entity with millions of alerts from serializing into one
    * task iterator at 100 TB.
    */
  def preAggregated(events: DataFrame): Dataset[TypedTask] = {
    import events.sparkSession.implicits._
    implicit val enc = EntityFold.typedTaskEncoder
    toEv(events)
      .groupBy($"user_id", $"event_type", expr("to_date(timestamp_seconds(epoch))").as("day"))
      .agg(
        count(lit(1)).as("cnt"),
        sum($"value").as("conns"),
        max($"epoch").as("max_epoch"),
        min($"event_id").as("seq"))
      .as[(Long, String, java.sql.Date, Long, Double, Long, Long)]
      .map { case (uid, cat, day, cnt, conns, maxEpoch, seq) =>
        val ops = Seq(
          ArrayUpsert("events", Seq("date" -> day.toString, "cat" -> cat),
            Seq(AddNum("n", cnt), AddNum("conns", conns))),
          AddNum("events_meta.total", cnt),
          AddToSet("events_meta.types", cat),
          SetMax("last_activity", maxEpoch),
          SetMax("_ttl.warden", maxEpoch + TtlWardenSecs))
        TypedTask("ip", uid, seq, "warden_receiver", ops)
      }
  }

  /** Cross-entity task derivation — the whois ref-count pattern
    * (`modules/whois.py:245–247,349–374`): each ip record emits tasks for its
    * parent block entity (`add _ref_cnt 1`, `setmax last_member`). In the
    * reference this is the `g.um.update` cross-entity call; here it is the
    * SECOND fold round of SURVEY §7.3 — tasks emitted by the ip round are
    * grouped and folded into `ipblock` records, bounded because the
    * entity-link graph (ip→block→org) is a DAG.
    */
  def blockRefTasks(ipEntities: DataFrame, blockSize: Long): Dataset[TypedTask] = {
    import ipEntities.sparkSession.implicits._
    implicit val enc = EntityFold.typedTaskEncoder
    ipEntities.select($"entity".cast("long")).as[Long].map { entity =>
      val block = entity / blockSize
      TypedTask("ipblock", block, entity, "whois", Seq(
        AddNum("_ref_cnt", 1L),
        SetMax("last_member", entity)))
    }
  }

  /** Blacklist-source tasks (`modules/redis_bl.py:154–158`): per listed ip,
    * upsert the `bl` presence record `{n: blacklistId}` with `v=1`, a
    * `setmax` check time, and the source's TTL token — a SECOND task source
    * whose ops merge into the same record as the warden stream (the
    * multi-source write path).
    */
  def blacklistTasks(listedIps: DataFrame, blacklistId: String,
                     checkEpoch: Long): Dataset[TypedTask] = {
    import listedIps.sparkSession.implicits._
    implicit val enc = EntityFold.typedTaskEncoder
    listedIps.select($"entity".cast("long")).as[Long].map { entity =>
      TypedTask("ip", entity, Long.MaxValue, "redis_bl", Seq(
        ArrayUpsert("bl", Seq("n" -> blacklistId),
          Seq(SetVal("v", 1L), SetMax("t", checkEpoch))),
        SetMax("_ttl.bl", checkEpoch + TtlWardenSecs)))
    }
  }

  /** Projection of a record folded from multiple task sources. */
  case class FoldedMulti(entity: Long, total: Long, n_bl: Long, ttl_tokens: Long)

  def projectMulti(eid: Long, rec: Rec): FoldedMulti = {
    val total = rec.get("events_meta").map(_.asInstanceOf[Rec]("total").asInstanceOf[Long]).getOrElse(0L)
    val nBl = rec.get("bl").map(_.asInstanceOf[scala.collection.mutable.ArrayBuffer[Any]].length.toLong).getOrElse(0L)
    val ttl = rec.get("_ttl").map(_.asInstanceOf[Rec].size.toLong).getOrElse(0L)
    FoldedMulti(eid, total, nBl, ttl)
  }

  /** Projection of a folded block record. */
  case class FoldedBlock(block: Long, ref_cnt: Long, last_member: Long)

  def projectBlock(eid: Long, rec: Rec): FoldedBlock =
    FoldedBlock(eid, rec("_ref_cnt").asInstanceOf[Long],
      rec("last_member").asInstanceOf[Long])

  /** Flat projection of a folded entity record for the correctness gate. */
  case class FoldedEntity(entity: Long, total: Long, types: String, n_buckets: Long,
                          conns: Double, last_activity: Long, ttl_warden: Long)

  /** Projection for the op-algebra long-tail gate query: one column per op
    * family exercised end-to-end (append / add_to_set / sub / setmin / set /
    * extend_set+rem_from_set).
    */
  case class OpsLongtail(entity: Long, ks: String, tp: String, c: Long,
                         mn: Long, lk: Long, es: String)

  def projectLongtail(eid: Long, rec: Rec): OpsLongtail = {
    def buf(k: String) = rec(k).asInstanceOf[scala.collection.mutable.ArrayBuffer[Any]]
    OpsLongtail(eid,
      buf("ks").mkString(","),
      buf("tp").mkString(","),
      rec("c").asInstanceOf[Long],
      rec("mn").asInstanceOf[Long],
      rec("lk").asInstanceOf[Long],
      buf("es").mkString(","))
  }

  /** Projection for the array-op/maintenance gate query: per-type counters
    * built by array_upsert, one element array_removed, a key removed, and a
    * next_step schedule.
    */
  case class OpsArray(entity: Long, bl: String, lk_present: Boolean, nru: Long)

  def projectOpsArray(eid: Long, rec: Rec): OpsArray = {
    val bl = rec("bl").asInstanceOf[scala.collection.mutable.ArrayBuffer[Any]]
      .map(_.asInstanceOf[Rec])
      .map(r => s"${r("n")}:${r("v")}").sorted.mkString(",")
    OpsArray(eid, bl, rec.contains("lk"), rec("nru").asInstanceOf[Long])
  }

  /** Projection for the on-demand web-record query (`NERDweb/nerd_main.py:
    * 1473–1489`): defined (Some) only for entities holding a `_ttl.web`
    * token, i.e. exactly the request set; `created` marks records that
    * existed only because the web request created them. The token arrived
    * through the external wire's `$datetime` envelope, so it is stored in
    * epoch MICROSECONDS — projected back to seconds at the output edge.
    */
  case class OnDemandRecord(entity: Long, created: Int, total: Long, ttl_web: Long)

  def projectOnDemand(eid: Long, rec: Rec): Option[OnDemandRecord] =
    rec.get("_ttl").map(_.asInstanceOf[Rec]).flatMap(_.get("web")).map { w =>
      val total = rec.get("events_meta")
        .map(_.asInstanceOf[Rec]("total").asInstanceOf[Long]).getOrElse(0L)
      OnDemandRecord(eid, if (rec.contains("events_meta")) 0 else 1, total,
        w.asInstanceOf[Long] / 1000000L)
    }

  /** Projection for the delete/weak-task gate query. */
  case class OpsDelete(entity: Long, n: Long)

  def projectOpsDelete(eid: Long, rec: Rec): OpsDelete =
    OpsDelete(eid, rec("n").asInstanceOf[Long])

  def projectFolded(eid: Long, rec: Rec): FoldedEntity = {
    val meta = rec("events_meta").asInstanceOf[Rec]
    val evs = rec("events").asInstanceOf[scala.collection.mutable.ArrayBuffer[Any]]
    val conns = evs.map(_.asInstanceOf[Rec]("conns").asInstanceOf[Double]).sum
    val types = meta("types").asInstanceOf[scala.collection.mutable.ArrayBuffer[Any]]
      .map(_.toString).sorted.mkString(",")
    FoldedEntity(
      entity = eid,
      total = meta("total").asInstanceOf[Long],
      types = types,
      n_buckets = evs.length.toLong,
      conns = conns, // rounded at the query edge (Spark round == DuckDB round, HALF_UP)
      last_activity = rec("last_activity").asInstanceOf[Long],
      ttl_warden = rec("_ttl").asInstanceOf[Rec]("warden").asInstanceOf[Long])
  }
}
