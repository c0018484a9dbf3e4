package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Funcs

/** Export sinks (reference `scripts/generate_ip_rep_list.sh`,
  * `scripts/generate_blocklist.sh`,
  * `scripts/generate_ip_category_files.py:39–116`): filter → sort → select →
  * CSV/text. The frames are exposed separately from the writers so the
  * correctness gate can oracle-check the content while the writers stay
  * thin `DataFrameWriter` calls.
  */
object Exports {

  /** `ip_rep.csv`: every scored entity as (ip, rep), numerically sorted by
    * IP (the shell script pipes through `sort -n`).
    */
  def ipRepFrame(rep: DataFrame): DataFrame =
    rep.select(Funcs.int2ipstr(col("entity")).as("ip"),
        round(col("rep"), 6).as("rep"), col("entity"))
      .orderBy(col("entity"))
      .drop("entity")

  /** Blocklist: entities at/above the reputation threshold, worst first
    * (`generate_blocklist.sh` filters `rep >= t` and sorts descending).
    */
  def blocklistFrame(rep: DataFrame, threshold: Double): DataFrame =
    rep.filter(col("rep") >= threshold)
      .select(Funcs.int2ipstr(col("entity")).as("ip"), round(col("rep"), 6).as("rep"),
        col("entity"))
      .orderBy(col("rep").desc, col("entity"))
      .drop("entity")

  /** Per-category listing (`generate_ip_category_files.py`): entities whose
    * significant types include the category, with the share as confidence.
    */
  def categoryFrame(typeShares: DataFrame, category: String): DataFrame =
    typeShares.filter(col("event_type") === category)
      .select(Funcs.int2ipstr(col("entity")).as("ip"),
        col("share_pct").as("confidence"), col("entity"))
      .orderBy(col("entity"))
      .drop("entity")

  def writeCsv(frame: DataFrame, path: String): Unit =
    frame.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)

  /** Training-corpus JSONL shard export: every document serialized as one
    * JSON line into a deterministic shard (md5-derived, RNG-free — the same
    * doc lands in the same shard on any cluster size or engine), written
    * `partitionBy(shard)` so each shard is an independently consumable file
    * set and the write parallelizes across shards AND partitions. This is
    * the handoff format between the curation engine and a training data
    * loader.
    *
    * At 100 TB the same call stands — partitioned text write, no coalesce,
    * no driver collection; shard count chooses the downstream read
    * granularity.
    */
  def writeTrainingShards(docs: DataFrame, nShards: Int, path: String): Unit =
    docs
      .withColumn("shard",
        (conv(substring(md5(concat(lit("shard|"), col("doc_id").cast("string"))),
          1, 8), 16, 10).cast("long") % nShards).cast("int"))
      .select(col("shard"),
        to_json(struct(col("doc_id"), col("lang"), col("source"), col("text")))
          .as("value"))
      .write.partitionBy("shard").mode("overwrite").text(path)

  /** Read a [[writeTrainingShards]] export back into a manifest frame
    * (doc_id, shard, lang, n_chars) — the round-trip proof that the shard
    * files parse and carry the full payload.
    */
  def readTrainingShards(spark: org.apache.spark.sql.SparkSession,
                         path: String): DataFrame = {
    val parsed = spark.read.text(path)
      .withColumn("j", from_json(col("value"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "doc_id LONG, lang STRING, source STRING, text STRING")))
    parsed.select(col("j.doc_id").as("doc_id"),
      col("shard").cast("int").as("shard"),
      col("j.lang").as("lang"),
      length(col("j.text")).cast("long").as("n_chars"))
  }
}
