package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Funcs

/** Feed-style sources (SURVEY §2.1): blacklist text parsing and the DShield
  * daily aggregation — the reference's downloader/parser pipelines
  * re-expressed as line-DataFrame transforms (`spark.read.text` upstream).
  */
object Feeds {

  /** Blacklist line parser (reference `NERDd/blacklists.py:45–188`
    * `compile_regex`/`parse_bl_*`): extract the first IPv4 per line; comment
    * and garbage lines yield nothing. Output: distinct int `ip`.
    */
  def parseBlacklistLines(lines: DataFrame): DataFrame = {
    val ipStr = regexp_extract(col("line"),
      "(\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3})", 1)
    lines.select(ipStr.as("ip_str"))
      .filter(col("ip_str") =!= "")
      .select(Funcs.ipstr2int(col("ip_str")).as("ip"))
      .distinct()
  }

  /** DShield daily feed aggregation (reference `NERDd/dshield.py:63–111`):
    * per (ip, day) report/target sums gated by minimum thresholds. Targets
    * are played by distinct event types (TESTDATA mapping).
    */
  def dshieldDaily(events: DataFrame, minReports: Long = 3L,
                   minTargets: Long = 2L): DataFrame =
    events
      .groupBy(col("user_id").as("entity"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("reports"),
        countDistinct(col("event_type")).as("targets"))
      .filter(col("reports") >= minReports && col("targets") >= minTargets)
}
