package graft.derive

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** FMP ("future misbehavior prediction") feature assembly — the DataFrame
  * restatement of the reference's nightly pandas pass
  * (`NERDd/fmp_updater.py:292–453`): per-entity activity counts with
  * `log1p` transforms, EWMA features, last-alert age with exponential decay
  * (`:414–420`), and /24-prefix aggregates joined back (`:292–354`,
  * `:436–453`), finished by a fixed-weight logistic scorer standing in for
  * the XGBoost model (the trained model is a fixture concern; the operator
  * surface is the feature pipeline).
  *
  * Shape at scale: the snapshot is already per-entity; the prefix pass is
  * one extra groupBy on the prefix key joined back broadcast (prefix table
  * is |entities|/16), so the whole assembly is 2 shuffles — where the
  * reference loads every record into a single pandas process.
  */
object Fmp {

  /** @param snapshot output of `Derive.snapshot`
    * @param lastDay  per-entity (entity, last_day) from the raw events
    * @param today    processing day (determinism: passed explicitly)
    */
  def features(snapshot: DataFrame, lastDay: DataFrame, today: String,
               prefixBits: Int = 4): DataFrame = {
    val prefixSize = 1L << prefixBits
    val prefix = snapshot
      .groupBy((col("entity") / prefixSize).cast("long").as("prefix"))
      .agg(
        sum(col("total7")).as("p_total7"),
        count(lit(1)).as("p_members"),
        round(avg(col("rep")), 6).as("p_avg_rep"))
    val withP = snapshot
      .withColumn("prefix", (col("entity") / prefixSize).cast("long"))
      .join(broadcast(prefix), Seq("prefix"))
      .join(lastDay, Seq("entity"))
      .withColumn("last_age", datediff(lit(today).cast("date"), col("last_day")))
    val decay = exp(-col("last_age") / 7.0d)
    val z = lit(-3d) + lit(2d) * col("rep") + lit(0.1d) * log1p(col("total7")) +
      lit(0.5d) * decay
    withP.select(
      col("entity"),
      round(log1p(col("total1")), 4).as("f_e1"),
      round(log1p(col("total7")), 4).as("f_e7"),
      round(log1p(col("total30")), 4).as("f_e30"),
      col("nodes_7d").cast("long").as("f_nodes7"),
      col("ewma").as("f_ewma"),
      col("bin_ewma").as("f_bin_ewma"),
      col("rep").as("f_rep"),
      col("last_age").cast("long").as("f_last_age"),
      round(decay, 4).as("f_decay"),
      col("p_total7").as("f_p_total7"),
      col("p_members").as("f_p_members"),
      col("p_avg_rep").as("f_p_avg_rep"),
      round(lit(1d) / (lit(1d) + exp(-z)), 4).as("fmp_general"))
  }
}
