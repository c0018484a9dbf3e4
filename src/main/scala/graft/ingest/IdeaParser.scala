package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IDEA-message source explosion (reference `NERDd/warden_receiver.py:460–584`
  * `receive_events`): one alert names SEVERAL source IPs
  * (`$.Source[*].IP4[*]`), and the receiver derives one update-task stream
  * PER IP, plus the normalized category string
  * (`'+'.join(categories).replace('.','')`, `:507`).
  *
  * Spark mapping (SURVEY §2.1): `from_json` with the IDEA schema subset, then
  * `explode(flatten(Source.IP4))` — a generator in the scan projection, no
  * shuffle until the per-entity aggregation. The exploded (event, entity)
  * rows are exactly the reference's `events_sources` side table
  * (`common/eventdb_psql.py:69–72`), so the event-listing join reads this
  * frame directly.
  */
object IdeaParser {

  /** The IDEA schema subset the ingest needs (DDL form for `from_json`). */
  val IdeaSchema: String =
    "Source ARRAY<STRUCT<IP4: ARRAY<BIGINT>>>, " +
      "Target ARRAY<STRUCT<IP4: ARRAY<BIGINT>, Port: ARRAY<BIGINT>>>, " +
      "Category ARRAY<STRING>"

  /** Source-side projection of [[IdeaSchema]]. Catalyst's JSON-expression
    * optimization does not prune `from_json` fields across the Generate in
    * the explode plan (verified with `.explain("formatted")`: the full
    * three-field schema reached Jackson), so each call site passes exactly
    * the fields it reads — the parser then skips the other subtrees
    * token-by-token instead of materializing them.
    */
  val SourceSchema: String =
    "Source ARRAY<STRUCT<IP4: ARRAY<BIGINT>>>, Category ARRAY<STRING>"

  /** Target-side projection of [[IdeaSchema]] (same pruning rationale). */
  val TargetSchema: String =
    "Target ARRAY<STRUCT<IP4: ARRAY<BIGINT>, Port: ARRAY<BIGINT>>>, " +
      "Category ARRAY<STRING>"

  /** Parse the JSON message column and emit one row per (event, source ip)
    * with the normalized category string — the events_sources frame.
    */
  def explodeSources(msgs: DataFrame, msgCol: String = "msg"): DataFrame =
    msgs
      .withColumn("idea", from_json(col(msgCol), SourceSchema, Map.empty[String, String]))
      .select(col("event_id"),
        explode(flatten(col("idea.Source.IP4"))).as("entity"),
        graft.functions.Funcs.normalizeCategories(col("idea.Category")).as("cat"))

  /** Per-entity roll-up of the exploded source rows: reference counts,
    * distinct alerts, and the category set each source IP appeared under.
    *
    * `count_distinct`, not `size(collect_set(...))`: the set of event ids
    * per entity grows with corpus size (a hot scanner IP at 100 TB names
    * billions of alerts), so collect_set is unbounded per-group state —
    * countDistinct dedups in the partial aggregate with bounded rows per
    * (entity, event_id) pair instead. The category set stays a collect_set:
    * its domain is the fixed threat taxonomy.
    */
  def sourceSummary(exploded: DataFrame): DataFrame =
    exploded.groupBy(col("entity")).agg(
      count(lit(1)).as("n_refs"),
      countDistinct(col("event_id")).as("n_events"),
      array_join(sort_array(collect_set(col("cat"))), ",").as("cats"))

  /** BOTH sides from ONE parse — for a consumer that needs sources AND
    * targets of the same message stream. The per-side entry points
    * ([[explodeSources]]/[[explodeTargets]]) each carry their own pruned
    * schema, which is right when a query reads one side; a caller that
    * reads both would parse every message TWICE (the plans don't share the
    * `from_json` across two scans). Here one `from_json` of the full
    * [[IdeaSchema]] feeds one generator over the concatenation of both
    * sides' (side, ips, ports) structs — one parse, one explode, and the
    * `side` discriminator splits downstream. Rows: (event_id, side
    * 'src'|'tgt', entity, cat, ports) with `ports` null on the source side.
    *
    * Each side's array is coalesced to empty BEFORE concat: a message with
    * only targets must still emit its target rows (`concat(null, x)` is
    * null, which would drop the whole event).
    */
  def explodeAll(msgs: DataFrame, msgCol: String = "msg"): DataFrame = {
    val sideT = "array<struct<side:string,ips:array<bigint>,ports:array<bigint>>>"
    val noPorts = lit(null).cast("array<bigint>")
    msgs
      .withColumn("idea", from_json(col(msgCol), IdeaSchema, Map.empty[String, String]))
      .select(col("event_id"),
        graft.functions.Funcs.normalizeCategories(col("idea.Category")).as("cat"),
        explode(concat(
          coalesce(transform(col("idea.Source"),
            s => struct(lit("src").as("side"),
              s.getField("IP4").as("ips"), noPorts.as("ports"))),
            array().cast(sideT)),
          coalesce(transform(col("idea.Target"),
            t => struct(lit("tgt").as("side"),
              t.getField("IP4").as("ips"), t.getField("Port").as("ports"))),
            array().cast(sideT)))).as("ent"))
      .select(col("event_id"), col("ent.side").as("side"),
        explode(col("ent.ips")).as("entity"),
        col("cat"), col("ent.ports").as("ports"))
  }

  /** The source-side rows of [[explodeAll]], in [[explodeSources]]' exact
    * schema — [[sourceSummary]] consumes either interchangeably.
    */
  def sourcesOf(all: DataFrame): DataFrame =
    all.filter(col("side") === "src")
      .select(col("event_id"), col("entity"), col("cat"))

  /** The target-side rows of [[explodeAll]], in [[explodeTargets]]' exact
    * schema — [[targetSummary]] consumes either interchangeably.
    */
  def targetsOf(all: DataFrame): DataFrame =
    all.filter(col("side") === "tgt")
      .select(col("event_id"), col("entity"), col("cat"), col("ports"))

  /** The `events_targets` side (`install/create_warden_db.sql:28–36`): one
    * row per (event, TARGET ip) from `$.Target[*].IP4[*]`, carrying the
    * target's port list — same generator-in-scan shape as the source side.
    */
  def explodeTargets(msgs: DataFrame, msgCol: String = "msg"): DataFrame =
    msgs
      .withColumn("idea", from_json(col(msgCol), TargetSchema, Map.empty[String, String]))
      .select(col("event_id"),
        explode(col("idea.Target")).as("tgt"),
        graft.functions.Funcs.normalizeCategories(col("idea.Category")).as("cat"))
      .select(col("event_id"),
        explode(col("tgt.IP4")).as("entity"),
        col("cat"),
        col("tgt.Port").as("ports"))

  /** Per-target-entity roll-up, with the distinct contacted ports
    * (numerically sorted, comma-joined).
    *
    * Same bounded-state discipline as [[sourceSummary]]: distinct alerts via
    * `count_distinct`, and the port roll-up collects the SET of port lists
    * (bounded by the distinct lists seen — port lists in real alerts are
    * short and highly repetitive) rather than a collect_list that grows one
    * entry per event row.
    */
  def targetSummary(exploded: DataFrame): DataFrame =
    exploded.groupBy(col("entity")).agg(
      count(lit(1)).as("n_refs"),
      countDistinct(col("event_id")).as("n_events"),
      array_join(sort_array(collect_set(col("cat"))), ",").as("cats"),
      array_join(
        transform(sort_array(array_distinct(flatten(collect_set(col("ports"))))),
          x => x.cast("string")), ",").as("ports"))
}
