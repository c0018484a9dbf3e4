package graft.derive

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Threat categorization at ingest + the per-entity category summary.
  *
  * Reference: `common/threat_categorization.py:112–141` (`classify_ip`) —
  * each configured category carries trigger expressions; an event is
  * assigned every category whose trigger fires, with the `unknown` fallback
  * when none does — and `NERDd/modules/threat_category_summary.py:40–119`
  * (`create_summary`) — per (entity, category): daily confidence
  * `nonlin(reports) · nonlin(sources)` over the last 14 days, combined as a
  * linear-decay weighted average normalized by the sum of PRESENT days'
  * weights (unlike reputation, which normalizes by the full-window sum).
  *
  * The Python-expression triggers of the reference config
  * (`etc/threat_categorization.yml`) become Column predicates over the
  * normalized event columns — evaluated as one ingest-time projection
  * (`rlike` for the regex triggers), exactly where the reference evaluates
  * them.
  */
object ThreatCategorize {

  /** One category rule: id, assigned role, and the compiled trigger. */
  final case class CatRule(id: String, role: String, trigger: Column)

  /** Classify each event: one output row per (event, assigned category);
    * events matching no trigger get the `unknown`/src fallback
    * (`threat_categorization.py:136–137`).
    */
  def classify(events: DataFrame, rules: Seq[CatRule]): DataFrame = {
    val entries = rules.map(r =>
      when(r.trigger, struct(lit(r.id).as("category"), lit(r.role).as("role"))))
    val matched = filter(array(entries: _*), e => e.isNotNull)
    val withFallback = when(size(matched) === 0,
      array(struct(lit("unknown").as("category"), lit("src").as("role"))))
      .otherwise(matched)
    events.withColumn("_cat", explode(withFallback))
      .withColumn("category", col("_cat.category"))
      .withColumn("role", col("_cat.role"))
      .drop("_cat")
  }

  /** The `_threat_category_summary` analog: per (entity, category, role)
    * over records younger than 14 days,
    * `conf = Σ nonlin(daily_reports)·nonlin(daily_sources)·w / Σ w` with
    * `w = (14 − age)/14`, rounded to 2 (reference
    * `threat_category_summary.py:78–112`). "Sources" are played by the
    * distinct reporting event types of the day. Two aggregations — per-day
    * then per-entity — the same partial-agg shape as the snapshot.
    */
  /** @param subcatCol optional subcategory value column (port/protocol
    *                   analog): distinct values union across kept days,
    *                   numerically sorted, capped at 10 (the reference caps
    *                   after `set()` without an order,
    *                   `threat_category_summary.py:109–112` — sorting first
    *                   makes the cap deterministic), emitted comma-joined.
    */
  def summary(classified: DataFrame, today: String, dateRange: Int = 14,
              subcatCol: Option[String] = None): DataFrame = {
    val subcatDaily = subcatCol.map(c => collect_set(col(c)).as("ks")).toList
    val daily = classified
      .withColumn("age", datediff(lit(today).cast("date"), to_date(col("ts"))))
      .filter(col("age") >= 0 && col("age") < dateRange)
      .groupBy(col("user_id").as("entity"), col("category"), col("role"), col("age"))
      .agg(count(lit(1)).as("n"),
        (size(collect_set(col("event_type"))).as("nsrc") +: subcatDaily): _*)
    // Weight (range − age)/range with the constant 1/range factored out of the
    // ratio: numerator terms are dyadic·integer (exactly representable, so the
    // sum is order-independent) and the denominator is an integer sum — the
    // rounded result is reproducible across engines and shuffle orders, where
    // the naive (range−age)/range sum rounds differently at half-unit
    // boundaries depending on accumulation order.
    val w = lit(dateRange) - col("age")
    val dc = Derive.nonlin(col("n"), 1d) * Derive.nonlin(col("nsrc"), 1d)
    val subcatFinal = subcatCol.map(_ =>
      array_join(
        transform(slice(sort_array(array_distinct(flatten(collect_list(col("ks"))))), 1, 10),
          x => x.cast("string")),
        ",").as("subcats")).toList
    daily.groupBy(col("entity"), col("category"), col("role"))
      .agg(
        // decimal hop before rounding: a conf landing exactly on a half
        // boundary (e.g. 14.25/50 = 0.285) rounds UP through Spark's
        // string-based double round but DOWN through DuckDB's binary round;
        // rounding the 10-dp decimal instead is engine-independent
        round((sum(dc * w) / sum(w)).cast("decimal(28,10)"), 2)
          .cast("double").as("conf"),
        (sum(col("n")).as("reports") +: subcatFinal): _*)
      .filter(col("conf") > 0)
  }
}
