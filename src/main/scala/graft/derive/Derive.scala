package graft.derive

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** NERD's derivation modules re-expressed as declarative column transforms
  * over the raw event table. The reference recomputes these per entity record
  * from the embedded per-day counters each `!every1d` (SURVEY §2.6); here each
  * stage is a `DataFrame => DataFrame` that Catalyst plans as partial-agg +
  * final-agg (map-side combine), so the same formulas hold at 100 TB with one
  * shuffle per stage keyed on the entity.
  *
  * All stages take `today` explicitly — every NERD window is relative to the
  * processing day (`event_counter.py:77–105`), and determinism requires the
  * caller to pin it (SURVEY §7.3).
  */
object Derive {

  /** `1 - coef^(v/scale)`, capped to 1.0 above 20 scale units — the reference
    * `nonlin` (`modules/reputation.py:16–21`).
    */
  def nonlin(v: Column, scale: Double, coef: Double = 0.5): Column =
    when(v / scale > 20d, 1.0d).otherwise(lit(1.0d) - pow(lit(coef), v / scale))

  private def withAge(events: DataFrame, today: String): DataFrame =
    events.withColumn("age", datediff(lit(today).cast("date"), to_date(col("ts"))))

  /** Event counters over 1/7/30-day trailing windows + EWMA / binary EWMA
    * (`modules/event_counter.py:52–116`): windows are inclusive
    * (`days_diff <= N`), EWMA weights `0.25 * 0.75^age` for `age < 7`, binary
    * EWMA weights presence of any event that day. "Detector nodes" are played
    * by `event_type` (TESTDATA mapping).
    *
    * Two-level aggregation: per (entity, age) day-buckets first — the exact
    * shape the reference stores inside each record — then per entity.
    */
  def eventCounter(events: DataFrame, today: String): DataFrame = {
    val perDay = withAge(events, today)
      .filter(col("age") <= 30 && col("age") >= 0)
      .groupBy(col("user_id").as("entity"), col("age"))
      .agg(count(lit(1)).as("n"), collect_set(col("event_type")).as("types"))
    val w = lit(0.25d) * pow(lit(0.75d), col("age"))
    perDay.groupBy(col("entity")).agg(
      sum(when(col("age") <= 1, col("n")).otherwise(0L)).as("total1"),
      sum(when(col("age") <= 7, col("n")).otherwise(0L)).as("total7"),
      sum(col("n")).as("total30"),
      size(array_distinct(flatten(collect_list(when(col("age") <= 1, col("types")))))).as("nodes_1d"),
      size(array_distinct(flatten(collect_list(when(col("age") <= 7, col("types")))))).as("nodes_7d"),
      size(array_distinct(flatten(collect_list(col("types"))))).as("nodes_30d"),
      round(sum(when(col("age") < 7, col("n") * w).otherwise(0d)), 6).as("ewma"),
      round(sum(when(col("age") < 7, w).otherwise(0d)), 6).as("bin_ewma"))
  }

  /** Warden partial reputation (`modules/reputation.py:100–136` with
    * `etc/reputation.yml` warden params): over ages 0..13, daily score
    * `nonlin(events, 10) * nonlin(detectors, 2)`, linear-decay weight
    * `(14 - age)/14`, normalized by the full-window weight sum 7.5 (absent
    * days contribute 0 because `nonlin(0) = 0`).
    */
  def reputationWarden(events: DataFrame, today: String): DataFrame = {
    val dateRange = 14
    val sumWeights = (1 to dateRange).map(_.toDouble / dateRange).sum // 7.5
    // size(collect_set) == exact countDistinct but avoids Catalyst's
    // two-phase distinct expansion — one exchange instead of two
    val daily = withAge(events, today)
      .filter(col("age") >= 0 && col("age") < dateRange)
      .groupBy(col("user_id").as("entity"), col("age"))
      .agg(count(lit(1)).as("n_events"),
        size(collect_set(col("event_type"))).as("n_detectors"))
    val weight = (lit(dateRange.toDouble) - col("age")) / dateRange.toDouble
    val dailyRep = nonlin(col("n_events"), 10d) * nonlin(col("n_detectors"), 2d)
    daily.groupBy(col("entity"))
      .agg(round(sum(dailyRep * weight) / sumWeights, 6).as("rep"))
  }

  /** Single-pass entity snapshot: counters (1/7/30d), EWMA, warden reputation
    * and the 30-day type set from ONE `groupBy(entity, age)` →
    * `groupBy(entity)` chain — the per-day bucket shape the reference stores
    * inside each record feeds every derivation, so at scale this is 2 shuffles
    * instead of one per module (`event_counter.py:52–116` +
    * `reputation.py:100–136` + type set fused).
    */
  def snapshot(events: DataFrame, today: String): DataFrame = {
    val dateRange = 14
    val sumWeights = (1 to dateRange).map(_.toDouble / dateRange).sum // 7.5
    val perDay = withAge(events, today)
      .filter(col("age") >= 0 && col("age") <= 30)
      .groupBy(col("user_id").as("entity"), col("age"))
      .agg(
        count(lit(1)).as("n"),
        collect_set(col("event_type")).as("types"))
      // det from the set already collected: same exact distinct count, no
      // two-phase distinct expansion (keeps the snapshot at 2 exchanges)
      .withColumn("det", size(col("types")))
    val w = lit(0.25d) * pow(lit(0.75d), col("age"))
    val repWeight = (lit(dateRange.toDouble) - col("age")) / dateRange.toDouble
    val dailyRep = nonlin(col("n"), 10d) * nonlin(col("det"), 2d)
    perDay.groupBy(col("entity")).agg(
      sum(when(col("age") <= 1, col("n")).otherwise(0L)).as("total1"),
      sum(when(col("age") <= 7, col("n")).otherwise(0L)).as("total7"),
      sum(col("n")).as("total30"),
      size(array_distinct(flatten(collect_list(when(col("age") <= 1, col("types")))))).as("nodes_1d"),
      size(array_distinct(flatten(collect_list(when(col("age") <= 7, col("types")))))).as("nodes_7d"),
      size(array_distinct(flatten(collect_list(col("types"))))).as("nodes_30d"),
      round(sum(when(col("age") < 7, col("n") * w).otherwise(0d)), 6).as("ewma"),
      round(sum(when(col("age") < 7, w).otherwise(0d)), 6).as("bin_ewma"),
      round(sum(when(col("age") < dateRange, dailyRep * repWeight).otherwise(0d)) / sumWeights, 6).as("rep"),
      sort_array(array_distinct(flatten(collect_list(col("types"))))).as("types_arr"))
      .withColumn("total", col("total30"))
  }

  /** Significant event types (`modules/event_type_counter.py:41–104`): over the
    * trailing `days` window, emit types whose share is >= `thresholdPct`% of
    * the entity's total, provided the total reaches `minEvents`.
    */
  def typeShares(events: DataFrame, today: String, days: Int = 30,
                 thresholdPct: Double = 5d, minEvents: Long = 10L): DataFrame = {
    val perType = withAge(events, today)
      .filter(col("age") >= 0 && col("age") <= days)
      .groupBy(col("user_id").as("entity"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val withTotal = perType.withColumn("total",
      sum(col("n")).over(org.apache.spark.sql.expressions.Window.partitionBy(col("entity"))))
    withTotal
      .filter(col("total") >= minEvents &&
        col("n") * 100d / col("total") >= thresholdPct)
      .select(col("entity"), col("event_type"), col("n"), col("total"),
        round(col("n") * 100d / col("total"), 4).as("share_pct"))
  }

  /** Retention cleaning (`modules/cleaner.py:64–202`): drop per-day event
    * buckets older than `maxAgeDays` and recompute `events_meta.total`.
    * Returns per-entity (kept buckets, kept total, dropped total).
    */
  def retention(events: DataFrame, today: String, maxAgeDays: Int = 14): DataFrame =
    withAge(events, today)
      .groupBy(col("user_id").as("entity"))
      .agg(
        sum(when(col("age") <= maxAgeDays, 1L).otherwise(0L)).as("kept_total"),
        sum(when(col("age") > maxAgeDays, 1L).otherwise(0L)).as("dropped_total"),
        countDistinct(when(col("age") <= maxAgeDays, to_date(col("ts")))).as("kept_days"))

  /** Inter-event intervals over the last-21-timestamps ring buffer
    * (reference `modules/intervals_between_events.py:23–32` keeps the last 21
    * event timestamps per record; `fmp_updater.py:228–238,428–433` derives
    * mean/median of the deltas). One groupBy; the ring buffer, deltas, and
    * exact median are array expressions (≤20 elements, so exact median by
    * sort is cheap and matches the reference, which never approximates).
    */
  def intervals(events: DataFrame, keep: Int = 21): DataFrame = {
    graft.GraftExtensions.register(events.sparkSession)
    val deltas = expr("transform(sequence(1, size(ring) - 1), i -> ring[i] - ring[i - 1])")
    val sortedD = expr("array_sort(deltas)")
    val n = expr("size(deltas)")
    events
      .groupBy(col("user_id").as("entity"))
      // native bounded aggregate (graft.functions.LatestK): the k latest
      // timestamps, ascending — O(k) group state instead of collect_list's
      // O(events-per-entity), the difference between a ring buffer and an
      // OOM on a hot entity at corpus scale
      .agg(call_function("latest_k", unix_timestamp(col("ts")), lit(keep)).as("ring"))
      // sequence(1, size-1) with size = 1 is sequence(1, 0) = DESCENDING [1, 0]
      // (default step -1), which would emit two null deltas for a one-event
      // entity; the reference produces no intervals there, so require >= 2.
      .filter(size(col("ring")) >= 2)
      .withColumn("deltas", deltas)
      .filter(size(col("deltas")) > 0)
      .withColumn("n_intervals", n.cast("long"))
      .withColumn("mean_interval",
        round(expr("aggregate(deltas, 0L, (a, x) -> a + x)") / col("n_intervals"), 4))
      .withColumn("sorted_d", sortedD)
      .withColumn("median_interval",
        round(when(col("n_intervals") % 2 === 1,
            expr("sorted_d[cast((n_intervals + 1) / 2 as int) - 1]").cast("double"))
          .otherwise((expr("sorted_d[cast(n_intervals / 2 as int) - 1]") +
            expr("sorted_d[cast(n_intervals / 2 as int)]")) / 2d), 4))
      .select(col("entity"), col("n_intervals"), col("mean_interval"), col("median_interval"))
  }

  /** TTL expiry (`modules/cleaner.py:204–241` + `modules/ttl_updater.py:46–77`):
    * each source stamps a TTL token (`setmax`); entities whose newest token is
    * in the past are deleted (`!DELETE`). Two promotion rules extend life:
    * highly_active when `total7 > threshold` (`check_high_activity`), and
    * long_active when the record's in-DB age — `last_activity − ts_added`,
    * here last event day minus first event day (record creation) — exceeds
    * the threshold (`check_long_activity`, `ttl_updater.py:54–58`).
    */
  def ttlExpiry(events: DataFrame, today: String, wardenTtlDays: Int = 14,
                highlyActiveThreshold: Long = 50L, highlyActiveTtlDays: Int = 30,
                longActiveThresholdDays: Int = 30, longActiveTtlDays: Int = 30): DataFrame = {
    val perEntity = withAge(events, today)
      .groupBy(col("user_id").as("entity"))
      .agg(
        min(to_date(col("ts"))).as("first_day"), // ts_added analog
        max(to_date(col("ts"))).as("last_day"),
        sum(when(col("age") <= 7, 1L).otherwise(0L)).as("total7"))
    perEntity
      .withColumn("ttl_warden", date_add(col("last_day"), wardenTtlDays))
      .withColumn("ttl_highly_active",
        when(col("total7") > highlyActiveThreshold, date_add(col("last_day"), highlyActiveTtlDays)))
      .withColumn("ttl_long_active",
        when(datediff(col("last_day"), col("first_day")) > longActiveThresholdDays,
          date_add(col("last_day"), longActiveTtlDays)))
      .withColumn("ttl_max", greatest(col("ttl_warden"),
        coalesce(col("ttl_highly_active"), col("ttl_warden")),
        coalesce(col("ttl_long_active"), col("ttl_warden"))))
      .withColumn("expired", (col("ttl_max") < lit(today).cast("date")).cast("int"))
  }
}
