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
}
