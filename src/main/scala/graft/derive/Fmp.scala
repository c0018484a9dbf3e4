package graft.derive

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** FMP ("future misbehavior prediction") feature assembly — the DataFrame
  * restatement of the reference's nightly pandas pass
  * (`NERDd/fmp_updater.py:10–56` feature list, `:355–520` assembly):
  *
  *  - alert metadata: 1d/7d alert+connection+node counts, alert/conn/binary
  *    EWMA (`get_events_meta`), log1p-transformed as the model input
  *  - last-alert age with exponential decay (`:414–420`)
  *  - inter-event interval mean/median over the last-21 ring, `exp(-x)`
  *    transformed (`:421–433`, `get_intervals_from_timestamps`)
  *  - prefix aggregates of the same metadata joined back (`:436–463`)
  *  - blacklist one-hots for the watched feeds (`:370–380,465–472`)
  *  - hostname/tag features: exists, static/dynamic (+1/−1), dsl,
  *    ip_in_hostname (`:474–503`)
  *  - country/ASN badness priors: known-entity count over the address-space
  *    size, broadcast-joined (`get_ctry_badness`/`get_asn_badness`,
  *    `:161–216`)
  *
  * finished by a fixed-weight logistic scorer standing in for the XGBoost
  * model (the trained model is a fixture concern; the operator surface is
  * the feature pipeline). "Connections" are played by the event `value`
  * column floored to an integer (exact sums cross-engine), blacklist
  * membership and hostname tags by the deterministic fixtures the blacklist
  * and hostname queries use.
  *
  * Shape at scale: one extra per-entity pass over raw events (conns +
  * interval ring), one prefix groupBy joined back broadcast
  * (|entities|/16), and two tiny badness priors joined broadcast — the
  * whole assembly stays at 3 shuffles where the reference loads every
  * record into a single pandas process.
  */
object Fmp {

  /** The ten watched blacklist feeds (`fmp_updater.py:371–382` `watched_bl`)
    * and the feature column each one-hot lands in.
    */
  val WatchedBl: Seq[(String, String)] = Seq(
    "tor_project_org_ips" -> "f_bl_tor",
    "blocklist-de-ssh"    -> "f_bl_ssh",
    "uceprotect"          -> "f_bl_uce",
    "sorbs-dul"           -> "f_bl_sorbs_dul",
    "sorbs-noserver"      -> "f_bl_sorbs_noserver",
    "sorbs-spam"          -> "f_bl_sorbs_spam",
    "spamcop"             -> "f_bl_spamcop",
    "spamhaus-pbl"        -> "f_bl_pbl",
    "spamhaus-pbl-isp"    -> "f_bl_pbl_isp",
    "spamhaus-xbl-cbl"    -> "f_bl_xbl")

  /** @param events   raw events (conns, last-day, and the interval ring
    *                  come from here)
    * @param snapshot output of `Derive.snapshot` (alert counters, EWMA, rep)
    * @param today    processing day (determinism: passed explicitly)
    * @param watchedBl materialized blacklist membership, one (entity, bl_id)
    *                  row per hit — the `rec['bl']` array the reference's
    *                  updater reads (`fmp_updater.py:371–382`), produced by
    *                  the engine's own feed joins (`Intel.blMembership`).
    *                  Blacklists are tiny against a 100-TB entity space, so
    *                  the aggregated per-entity sets broadcast onto the
    *                  feature assembly; entities with no hits see all-zero
    *                  one-hots through the left join.
    */
  def features(events: DataFrame, snapshot: DataFrame, today: String,
               watchedBl: DataFrame, prefixBits: Int = 4): DataFrame = {
    graft.GraftExtensions.register(events.sparkSession)
    val prefixSize = 1L << prefixBits

    // ---- per-entity extras from raw events ----
    val aged = events
      .withColumn("age", datediff(lit(today).cast("date"), to_date(col("ts"))))
      .withColumn("conns", floor(col("value")).cast("long"))
    val xtra = aged.groupBy(col("user_id").as("entity")).agg(
      max(to_date(col("ts"))).as("last_day"),
      sum(when(col("age") <= 1, col("conns")).otherwise(0L)).as("conns1"),
      sum(when(col("age") <= 7, col("conns")).otherwise(0L)).as("conns7"),
      // dyadic weight × integer conns ⇒ exactly-representable terms, the
      // order-independent-sum rule the snapshot EWMA follows
      round(coalesce(sum(when(col("age") < 7,
        col("conns") * lit(0.25d) * pow(lit(0.75d), col("age")))), lit(0d)), 6)
        .as("conns_ewma"),
      // last-21 ring (intervals_between_events.py:23–32) via the bounded
      // native latest_k aggregate — O(21) group state, not O(events); the
      // delta mean telescopes to (last − first)/(n − 1), the median sorts
      // ≤20 deltas
      call_function("latest_k", unix_timestamp(col("ts")), lit(21)).as("ring"))
      .withColumn("nd", size(col("ring")) - 1)
      .withColumn("mean_days", when(col("nd") < 1, lit(0d)).otherwise(
        (element_at(col("ring"), -1) - element_at(col("ring"), 1)).cast("double") /
          (col("nd").cast("double") * 86400d)))
      .withColumn("sd", when(col("nd") < 1, array().cast("array<bigint>")).otherwise(
        expr("array_sort(transform(sequence(1, size(ring) - 1), i -> ring[i] - ring[i - 1]))")))
      .withColumn("median_days", when(col("nd") < 1, lit(0d)).otherwise(
        when(col("nd") % 2 === 1,
            expr("sd[cast((nd + 1) / 2 as int) - 1]").cast("double"))
          .otherwise((expr("sd[cast(nd / 2 as int) - 1]") +
            expr("sd[cast(nd / 2 as int)]")) / 2d) / 86400d))
    // guard against the one-event ring: nd = 0 must not reach sequence(1, 0)
    val base = snapshot.join(xtra.drop("ring", "sd"), Seq("entity"))

    // ---- /24-prefix analog aggregates (fmp_updater.py:436–463) ----
    val prefix = base
      .groupBy((col("entity") / prefixSize).cast("long").as("prefix"))
      .agg(
        sum(col("total1")).as("p_total1"),
        sum(col("total7")).as("p_total7"),
        count(lit(1)).as("p_members"),
        // active-member counts (prefix_ips_1d / prefix_ips_7d): members with
        // any alert inside the window, not the full membership count
        sum(when(col("total1") > 0, 1L).otherwise(0L)).as("p_ips1"),
        sum(when(col("total7") > 0, 1L).otherwise(0L)).as("p_ips7"),
        // exact decimal sum, then the decimal-hop round: the average can land
        // exactly on a half at 6 dp (seen at sf0.1: 1.1518/16 = 0.0719875),
        // where Spark's string-based and DuckDB's binary round disagree
        round((sum(col("rep").cast("decimal(18,6)")) / count(lit(1)))
          .cast("decimal(28,10)"), 6).cast("double").as("p_avg_rep"),
        sum(col("nodes_1d")).as("p_nodes1"),
        sum(col("nodes_7d")).as("p_nodes7"),
        sum(col("conns1")).as("p_conns1"),
        sum(col("conns7")).as("p_conns7"),
        // decimal sums: exact regardless of shuffle order (the members are
        // 6-dp rounded doubles whose double-sum would be order-dependent)
        sum(col("ewma").cast("decimal(18,6)")).cast("double").as("p_ewma"),
        sum(col("conns_ewma").cast("decimal(18,6)")).cast("double").as("p_conns_ewma"),
        sum(col("bin_ewma").cast("decimal(18,6)")).cast("double").as("p_bin_ewma"))

    // ---- geo badness priors: known-entity count / address-space size,
    //      computed once and broadcast (get_ctry_badness, :161–216) ----
    val ctryPrior = snapshot.groupBy((col("entity") % 8).as("gk"))
      .agg(count(lit(1)).as("ctry_known"))
      .withColumn("ctry_badness",
        round((col("ctry_known") / ((col("gk") + 1) * 1000d)).cast("decimal(28,10)"), 6)
          .cast("double"))
    val asnPrior = snapshot.groupBy((expr("entity div 16") * 7 % 50).as("ak"))
      .agg(count(lit(1)).as("asn_known"))
      .withColumn("asn_badness",
        round((col("asn_known") / ((col("ak") + 1) * 100d)).cast("decimal(28,10)"), 6)
          .cast("double"))

    // ---- fixture-backed record attributes (same constructions as the
    //      blacklist / hostname queries) ----
    val sfx = (col("entity") % 4).cast("int")
    val hostExists = col("entity") % 6 =!= 0
    val suffix = element_at(
      array(lit(".cs.uni.edu"), lit(".agency.gov"), lit(".dyn.example.com"), lit(".shady.xyz")),
      sfx + 1)
    val host = concat(lit("h"), col("entity"), suffix)
    val ip = (col("entity") * 2654435761L) % 4294967296L

    // per-entity blacklist-hit sets: the `bl[]` array the updater reads,
    // broadcast (membership ≪ entity space) with all-zero fallback
    val blSets = watchedBl.groupBy(col("entity"))
      .agg(collect_set(col("bl_id")).as("bl"))

    val withP = base
      .withColumn("prefix", (col("entity") / prefixSize).cast("long"))
      .join(broadcast(prefix), Seq("prefix"))
      .withColumn("gk", col("entity") % 8)
      .join(broadcast(ctryPrior), Seq("gk"))
      .withColumn("ak", expr("entity div 16") * 7 % 50)
      .join(broadcast(asnPrior), Seq("ak"))
      .join(broadcast(blSets), Seq("entity"), "left")
      .withColumn("last_age", datediff(lit(today).cast("date"), col("last_day")))
    val decay = exp(-col("last_age") / 7.0d)
    val z = lit(-3d) + lit(2d) * col("rep") + lit(0.1d) * log1p(col("total7")) +
      lit(0.5d) * decay

    withP.select(Seq(
      col("entity"),
      // alert metadata (log1p model inputs, fmp_updater.py:398–409)
      round(log1p(col("total1")), 4).as("f_e1"),
      round(log1p(col("total7")), 4).as("f_e7"),
      round(log1p(col("total30")), 4).as("f_e30"),
      col("nodes_1d").cast("long").as("f_nodes1"),
      col("nodes_7d").cast("long").as("f_nodes7"),
      round(log1p(col("conns1")), 4).as("f_conns1"),
      round(log1p(col("conns7")), 4).as("f_conns7"),
      col("ewma").as("f_ewma"),
      col("conns_ewma").as("f_conns_ewma"),
      col("bin_ewma").as("f_bin_ewma"),
      col("rep").as("f_rep"),
      // last-alert age + decay transform (:414–420)
      col("last_age").cast("long").as("f_last_age"),
      round(decay, 4).as("f_decay"),
      // interval features, exp(-x) transformed (:421–433)
      round(exp(-col("mean_days")), 4).as("f_intervals_avg"),
      round(exp(-col("median_days")), 4).as("f_intervals_med"),
      // prefix aggregates (:436–463) — the full 1d/7d/ewma set
      round(log1p(col("p_total1")), 4).as("f_p_e1"),
      round(log1p(col("p_total7")), 4).as("f_p_e7"),
      col("p_total7").as("f_p_total7"),
      col("p_members").as("f_p_members"),
      col("p_ips1").as("f_p_ips1"),
      col("p_ips7").as("f_p_ips7"),
      col("p_avg_rep").as("f_p_avg_rep"),
      col("p_nodes1").as("f_p_nodes1"),
      col("p_nodes7").as("f_p_nodes7"),
      round(log1p(col("p_conns1")), 4).as("f_p_conns1"),
      round(log1p(col("p_conns7")), 4).as("f_p_conns7"),
      col("p_ewma").as("f_p_ewma"),
      col("p_conns_ewma").as("f_p_conns_ewma"),
      col("p_bin_ewma").as("f_p_bin_ewma")
    ) ++ WatchedBl.map { case (blId, colName) =>
      // blacklist one-hots (:370–380): JOINED membership, not a synthesized
      // predicate — array_contains over the broadcast bl[] set
      coalesce(array_contains(col("bl"), lit(blId)).cast("int"), lit(0)).as(colName)
    } ++ Seq(
      // hostname / tag features (:474–503)
      hostExists.cast("int").as("f_hostname"),
      when(!hostExists, 0).when(sfx.isin(0, 1), 1).when(sfx === 2, -1)
        .otherwise(0).as("f_dyn_static"),
      when(hostExists && sfx === 2 && col("entity") % 2 === 0, 1).otherwise(0).as("f_dsl"),
      when(hostExists, graft.functions.Funcs.ipInHostname(host, ip).cast("int"))
        .otherwise(0).as("f_ip_in_host"),
      // geolocation badness (:506–514)
      col("ctry_badness").as("f_ctry_badness"),
      col("asn_badness").as("f_asn_badness"),
      round(lit(1d) / (lit(1d) + exp(-z)), 4).as("fmp_general")): _*)
  }

  // ---- tree-ensemble model apply (fmp_updater.py:521 `clf.predict_proba`) --

  /** A regression-tree node. The reference scores its feature frame with a
    * trained XGBoost classifier; the Spark-first restatement of *model apply*
    * is compiling the ensemble into native Catalyst expressions — each tree
    * becomes one nested CASE WHEN column, the margin their sum, so scoring is
    * a map-side, whole-stage-codegen'd projection with zero UDFs, zero
    * shuffles, and no per-executor model object to ship.
    */
  sealed trait Tree
  final case class Leaf(weight: Double) extends Tree
  /** Rows with `feature < threshold` descend into `lo`, others (including
    * NULL — XGBoost's default-right missing direction) into `hi`.
    */
  final case class Split(feature: String, threshold: Double, lo: Tree, hi: Tree) extends Tree

  /** One tree → one Column. `when(pred, lo)` leaves NULL predicates to the
    * otherwise branch, giving the documented default-right missing routing.
    */
  def treeColumn(t: Tree): org.apache.spark.sql.Column = t match {
    case Leaf(w)               => lit(w)
    case Split(f, th, lo, hi)  =>
      when(col(f) < lit(th), treeColumn(lo)).otherwise(treeColumn(hi))
  }

  /** The same tree as ANSI SQL (for cross-engine oracles): CASE WHEN with a
    * NULL comparison falls to ELSE, matching [[treeColumn]]'s routing.
    * Integer thresholds render as integer literals; weights as explicit
    * DOUBLE casts (a bare decimal literal is DECIMAL-typed in DuckDB and
    * would switch the margin sum to decimal arithmetic).
    */
  def treeSql(t: Tree): String = t match {
    case Leaf(w)              => s"CAST($w AS DOUBLE)"
    case Split(f, th, lo, hi) =>
      val lith = if (th == th.floor) th.toLong.toString else s"CAST($th AS DOUBLE)"
      s"CASE WHEN $f < $lith THEN ${treeSql(lo)} ELSE ${treeSql(hi)} END"
  }

  /** Ensemble apply: margin = Σ tree outputs (left-to-right, the same fold
    * order [[treeSql]] renders, so cross-engine sums are bit-identical),
    * predicted = margin > 0. No output rounding needed: the demo ensemble's
    * weights are dyadic (k/2¹⁰), so every partial sum is exact.
    */
  def scoreTrees(features: DataFrame, ensemble: Seq[Tree],
                 idCol: String = "entity"): DataFrame =
    features
      .select(col(idCol), ensemble.map(treeColumn).reduce(_ + _).as("margin"))
      .withColumn("predicted", (col("margin") > 0).cast("int"))

  /** Fixture ensemble standing in for the trained model (same stance as the
    * logistic `fmp_general`). Splits use only integer-valued features with
    * integer thresholds and dyadic leaf weights — every comparison and sum
    * reproduces exactly in any engine.
    */
  val DemoEnsemble: Seq[Tree] = Seq(
    Split("f_nodes7", 3,
      Split("f_bl_tor", 1, Leaf(-0.125), Leaf(0.25)),
      Split("f_last_age", 8, Leaf(0.375), Leaf(0.0625))),
    Split("f_p_members", 10,
      Leaf(-0.1875),
      Split("f_hostname", 1, Leaf(0.125), Leaf(-0.0625))),
    Split("f_dyn_static", 0,
      Leaf(0.3125),
      Split("f_dsl", 1, Split("f_bl_sorbs_spam", 1, Leaf(-0.03125), Leaf(0.21875)),
        Leaf(-0.25))))
}
