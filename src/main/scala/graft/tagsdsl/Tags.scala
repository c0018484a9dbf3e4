package graft.tagsdsl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tag evaluation over an entity snapshot — the set-oriented restatement of
  * the reference's per-record `update_tags` (`NERDd/modules/tags.py:142–231`):
  * instead of diffing one record's tag map per update event, every tag's
  * condition/confidence/info compiles to a column expression and the whole
  * snapshot is tagged in ONE narrow projection (no shuffle, fully
  * whole-stage-codegen — the shape that holds at 100 TB). The reference's
  * incremental trigger bookkeeping (`triggers` dict) is subsumed by
  * recomputation: conditions are pure functions of the record, so a full
  * pass per batch gives the same fixpoint the trigger cascade converges to.
  */
object Tags {

  /** One rule from the tags config (`etc/tags.yml` entries: id + condition +
    * optional info template).
    */
  final case class TagDef(id: String, condition: String, info: Option[String] = None)

  /** Evaluate all tags; one output row per (entity, satisfied tag), with
    * confidence rounded for cross-engine comparison. Entities satisfying no
    * tag produce no rows (the reference stores an absent `tags` key).
    */
  def evaluate(snapshot: DataFrame, tags: Seq[TagDef],
               jsonCol: Option[String] = None): DataFrame = {
    val schema = snapshot.schema
    val entries = tags.map { t =>
      val c = TagsDsl.compileCondition(t.condition, schema, jsonCol)
      val info = t.info.map(i => TagsDsl.compileInfo(i, schema))
        .getOrElse(lit(null).cast("string"))
      when(c.logical, struct(
        lit(t.id).as("tag_id"),
        round(c.confidence, 6).as("confidence"),
        info.as("info")))
    }
    snapshot
      .withColumn("_tag", explode(filter(array(entries: _*), e => e.isNotNull)))
      .select(col("entity"), col("_tag.tag_id").as("tag_id"),
        col("_tag.confidence").as("confidence"), col("_tag.info").as("info"))
  }

  /** The record-shaped variant: the full tags map as one `MapType` column
    * (tagID → {confidence, info}), mirroring the reference's `tags` attribute
    * (`tags.py:206–229`).
    */
  def tagsMapColumn(snapshot: DataFrame, tags: Seq[TagDef],
                    jsonCol: Option[String] = None): DataFrame = {
    val schema = snapshot.schema
    val entries = tags.map { t =>
      val c = TagsDsl.compileCondition(t.condition, schema, jsonCol)
      val info = t.info.map(i => TagsDsl.compileInfo(i, schema))
        .getOrElse(lit(null).cast("string"))
      when(c.logical, struct(
        lit(t.id).as("key"),
        struct(round(c.confidence, 6).as("confidence"), info.as("info")).as("value")))
    }
    snapshot.withColumn("tags",
      map_from_entries(filter(array(entries: _*), e => e.isNotNull)))
  }
}
