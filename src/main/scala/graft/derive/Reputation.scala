package graft.derive

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Config-driven multi-source reputation (reference
  * `NERDd/modules/reputation.py:100–136` with `etc/reputation.yml` params).
  *
  * Per source module m: daily reputation
  * `nonlin(events_d, scale_e, coef_e) [· nonlin(detectors_d, scale_d, coef_d)]`
  * over ages 0..date_range−1, combined as a weighted average with the
  * configured decay — `linear` ((range−d)/range), `half_life` (0.5^(d/hl)),
  * or `none` — normalized by the FULL-window weight sum (absent days
  * contribute nonlin(0) = 0, `reputation.py:118–135`). Total:
  * `rep = 1 − Π_m (1 − trust_m · rep_m)` (`rep_total`,
  * `reputation.py:100–109`).
  *
  * Execution shape: ONE `groupBy(entity, age)` pass computes every source's
  * per-day inputs as conditional aggregates, then ONE `groupBy(entity)`
  * produces all partials and the combined score — 2 shuffles total
  * regardless of the number of sources, where the reference recomputes each
  * partial per record per trigger.
  */
object Reputation {

  /** One source module's parameters (`etc/reputation.yml` rep_params entry).
    * `filter` selects this source's events from the stream; `scaleDetectors`
    * None disables the detector factor (like dshield/otx/misp configs).
    */
  final case class RepSource(
      name: String,
      filter: Column,
      scaleEvents: Double,
      coefEvents: Double = 0.5,
      scaleDetectors: Option[Double] = None,
      coefDetectors: Double = 0.5,
      dateRange: Int = 14,
      timeDecay: String = "linear", // linear | half_life | none
      halfLife: Double = 1d,
      trustFactor: Double = 1d)

  /** Σ weight over the full window — the constant denominator of the
    * weighted average (`reputation.py:126–135`).
    */
  def sumWeight(s: RepSource): Double = s.timeDecay match {
    case "linear"    => (1 to s.dateRange).map(_.toDouble / s.dateRange).sum
    case "half_life" => (0 until s.dateRange).map(d => math.pow(0.5, d / s.halfLife)).sum
    case "none"      => s.dateRange.toDouble
  }

  private def weight(s: RepSource): Column = s.timeDecay match {
    case "linear"    => (lit(s.dateRange.toDouble) - col("age")) / s.dateRange.toDouble
    case "half_life" => pow(lit(0.5d), col("age") / s.halfLife)
    case "none"      => lit(1d)
  }

  /** Per-entity partial reputation `rep_<name>` for every source plus the
    * combined `rep`, all rounded to 6 at the output edge (partials combine
    * unrounded).
    */
  def multiSource(events: DataFrame, today: String, sources: Seq[RepSource]): DataFrame = {
    val aged = events
      .withColumn("age", datediff(lit(today).cast("date"), to_date(col("ts"))))
      .filter(col("age") >= 0)
    val perDayAggs = sources.flatMap { s =>
      // size(collect_set) = exact distinct without the two-phase distinct
      // expansion; collect_set drops the nulls the filter produces, matching
      // countDistinct's null semantics
      sum(when(s.filter, 1L).otherwise(0L)).as(s"n_${s.name}") ::
        s.scaleDetectors.map(_ =>
          size(collect_set(when(s.filter, col("event_type")))).as(s"det_${s.name}")).toList
    }
    val perDay = aged
      .groupBy(col("user_id").as("entity"), col("age"))
      .agg(perDayAggs.head, perDayAggs.tail: _*)
    val partials = sources.map { s =>
      val daily = Derive.nonlin(col(s"n_${s.name}"), s.scaleEvents, s.coefEvents) *
        s.scaleDetectors.map(sd => Derive.nonlin(col(s"det_${s.name}"), sd, s.coefDetectors))
          .getOrElse(lit(1d))
      (sum(when(col("age") < s.dateRange, daily * weight(s)).otherwise(0d)) / sumWeight(s))
        .as(s"raw_${s.name}")
    }
    val folded = perDay.groupBy(col("entity")).agg(partials.head, partials.tail: _*)
    val combined = sources
      .map(s => lit(1d) - lit(s.trustFactor) * col(s"raw_${s.name}"))
      .reduce(_ * _)
    sources.foldLeft(folded.withColumn("rep", round(lit(1d) - combined, 6))) {
      case (df, s) => df.withColumn(s"rep_${s.name}", round(col(s"raw_${s.name}"), 6))
        .drop(s"raw_${s.name}")
    }.select(col("entity") +:
      sources.map(s => col(s"rep_${s.name}")) :+ col("rep"): _*)
  }
}
