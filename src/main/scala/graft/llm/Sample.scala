package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-mix assembly: deterministic sampling and ordering operators.
  *
  * Everything here is RNG-free — sampling and shuffle order both derive from
  * `md5` of row content, so a training mix is exactly reproducible across
  * runs, engines, and cluster sizes (no seed plumbing, no partition-order
  * sensitivity), and any row's inclusion can be audited after the fact.
  */
object Sample {

  /** Deterministic stratified sample: up to `quota` documents per stratum
    * (language, source, quality bucket — any column), chosen by md5 rank.
    * `md5(text)` is a uniform [0,2¹²⁸) draw that any engine reproduces;
    * ranking it per stratum IS a uniform random sample, with `doc_id` as the
    * tiebreak for byte-identical duplicate texts.
    *
    * Scale shape: one shuffle partitioning by the stratum column. Strata are
    * few (languages × sources) but large at 100 TB, so a single giant
    * stratum serializes through one partition's sort; [[stratifiedBucketed]]
    * is the scale-out form. The exact-rank variant stays because it is
    * oracle-exact and the right tool when strata are modest.
    */
  def stratified(docs: DataFrame, strataCol: String, quota: Int): DataFrame = {
    val w = Window.partitionBy(col(strataCol)).orderBy(md5(col("text")), col("doc_id"))
    docs
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= quota)
      .select(col("doc_id"), col(strataCol).as("stratum"), col("rk").cast("long").as("rk"))
  }

  /** Scale-out stratified sample: each stratum is sub-bucketed by an
    * INDEPENDENT salted md5 hash into `buckets` buckets and each bucket takes
    * its share of the quota (quota/B, the first quota%B buckets one extra) by
    * the same md5 rank [[stratified]] uses. Statistically identical to the
    * exact-rank sample — bucket membership is a uniform draw independent of
    * the rank key — but the sort partitions by (stratum, bucket), so a
    * dominant stratum (English at 60% of a 100-TB corpus) fans out across B
    * parallel sorts instead of serializing through one partition.
    *
    * `buckets = 1` degenerates to exactly [[stratified]] (plus the bucket
    * column); at any B the per-stratum total is exactly `quota` whenever
    * every bucket holds at least its share (short buckets under-fill, never
    * spill into neighbors — the price of zero cross-bucket coordination).
    */
  def stratifiedBucketed(docs: DataFrame, strataCol: String, quota: Int,
                         buckets: Int = 32): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    // salted hash ("bkt|" prefix): bucket membership must be independent of
    // the md5(text) RANK key, or low buckets would collect low ranks
    val bucket = pmod(
      conv(substring(md5(concat(lit("bkt|"), col("text"))), 1, 8), 16, 10).cast("long"),
      lit(buckets.toLong))
    val share = when(col("bucket") < lit(quota % buckets), lit(quota / buckets + 1))
      .otherwise(lit(quota / buckets))
    val w = Window.partitionBy(col(strataCol), col("bucket"))
      .orderBy(md5(col("text")), col("doc_id"))
    docs
      .withColumn("bucket", bucket)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= share)
      .select(col("doc_id"), col(strataCol).as("stratum"), col("bucket"),
        col("rk").cast("long").as("rk"))
  }

  /** Sequence-packing manifest: assign each document a (bin, offset) inside
    * fixed token-budget training sequences, contiguous-fill per stratum —
    * bin = ⌊prior-token-count / ctxLen⌋ over docs in id order. The manifest
    * is what a loader needs to assemble packed batches; a document whose
    * tokens straddle its bin boundary is split/truncated by the downstream
    * policy (the manifest records the exact offset, so both policies are
    * implementable without re-reading the corpus).
    *
    * Scale shape: one running-sum window PER STRATUM (languages × sources —
    * many independent partitions), not a global cumulative sum; each stratum
    * sorts by the already-clustered doc_id. Deterministic and engine-exact:
    * token counts are integers, so the running sum has no float order
    * sensitivity.
    */
  def packSequences(docs: DataFrame, ctxLen: Int, strataCol: String = "lang"): DataFrame = {
    val prior = Window.partitionBy(col("stratum")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(col("doc_id"), col(strataCol).as("stratum"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("prior", coalesce(sum(col("n_tokens")).over(prior), lit(0L)))
      .select(col("doc_id"), col("stratum"), col("n_tokens"),
        (col("prior") / ctxLen).cast("long").as("bin"),
        (col("prior") % ctxLen).as("offset"))
  }

  /** Temperature-scaled stratum rebalancing — the multilingual data-mix
    * sampler: stratum keep-probability ∝ share^(1/τ) (τ=1 preserves the
    * natural distribution, τ→∞ approaches uniform across strata), scaled so
    * the expected kept volume is `targetFrac` of the corpus, capped at 1.
    * Head languages are downsampled, tail languages keep (nearly) all docs.
    *
    * Deterministic and auditable like everything here: a document's uniform
    * draw is its salted md5 — keep iff `u < p(stratum)` — so the same corpus
    * always yields the same mix and any inclusion is recomputable. The
    * per-stratum table is a handful of rows, broadcast onto the scan: one
    * aggregate pass + one narrow filtered projection, no shuffle of the
    * corpus itself. The two corpus scalars (size, weight total) come from ONE
    * driver action over the per-stratum counts: with
    * `w = (cnt/n)^(1/τ)`, `p = targetFrac·n·w / (cnt·Σw)` rewrites to
    * `targetFrac·n·cnt^(1/τ) / (cnt·Σ cnt^(1/τ))` — the n^(1/τ) factor
    * cancels, so no pass needs `n` before the weights exist.
    *
    * `p` is quantized to 12 decimals BEFORE the membership comparison:
    * the weight total is a float sum whose last ulp can differ between
    * engines (partition order, libm pow), and an unquantized `u < p` flips
    * any doc whose draw lands within that ulp. 12 decimals is far below any
    * sampling-precision concern (quota error ≤ n·10⁻¹²) and far above
    * cross-engine float noise.
    */
  /** Cluster-size-aware SOFT dedup: keep each document with probability
    * 1/|its near-dup cluster| — in expectation one survivor per duplicate
    * group, but WHICH copy survives varies per cluster instead of always
    * hard-picking the canonical minimum (the "soft deduplication" used when
    * some duplication is wanted for distributional reasons but cluster mass
    * must stop scaling with copy count; singleton clusters pass untouched
    * at p = 1). Deterministic and RNG-free like every sampler here: the
    * draw is the salted-md5 32-bit integer against `2³² div csize` — an
    * INTEGER comparison (u < 1/size up to the floor), so no FP boundary and
    * no overflow at any cluster size, replayed exactly by the oracle.
    *
    * Scale shape: input is [[graft.llm.Dedup.clusterAssignments]]'s
    * (doc_id, cluster, csize) — the draw is one stateless projection over
    * it, no extra shuffle. Output: (doc_id, cluster, csize) of survivors.
    */
  def softDedupSample(assignments: DataFrame): DataFrame = {
    val raw = conv(substring(md5(concat_ws("|", lit("softdd"),
      col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long")
    assignments
      .filter(raw < expr("CAST(4294967296 AS BIGINT) div csize"))
      .select(col("doc_id"), col("cluster"), col("csize"))
  }

  def temperatureSample(docs: DataFrame, strataCol: String, tau: Double,
                        targetFrac: Double = 0.5): DataFrame = {
    val shares = docs.groupBy(col(strataCol).as("stratum"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("pw", pow(col("cnt"), 1.0d / tau))
    val totals = shares.agg(sum(col("cnt")), sum(col("pw"))).head
    val n = totals.getLong(0).toDouble
    val totPw = totals.getDouble(1)
    // expected kept rows per stratum = n·targetFrac·w/Σw ⇒ per-doc
    // probability is that over the stratum count, capped at keep-everything
    val probs = shares.withColumn("p",
      round(least(lit(1d), lit(targetFrac * n / totPw) * col("pw") / col("cnt")), 12))
    val u = conv(substring(md5(concat_ws("|", lit("tsamp"), col("doc_id"))), 1, 8), 16, 10)
      .cast("double") / 4294967296.0d
    docs.select(col("doc_id"), col(strataCol).as("stratum"))
      .join(broadcast(probs.select(col("stratum"), col("p"))), Seq("stratum"))
      .filter(u < col("p"))
      .select(col("doc_id"), col("stratum"), round(col("p"), 6).as("keep_p"))
  }

  /** Token-budget source mixing — the "how many epochs of each source"
    * table a pretraining run is planned from (the Llama-1 recipe: small
    * high-value sources run multiple epochs, the big crawl runs less than
    * one). Given a total token budget and a per-source epoch cap:
    *
    *  1. per-source token counts (ONE corpus pass, map-side combined —
    *     the only at-scale work here);
    *  2. temperature-flattened target shares `√tokens_s / Σ√tokens`
    *     (τ = 2 fixed, as `sqrt` — IEEE-correctly-rounded in BOTH engines,
    *     unlike a general `pow`, so the oracle replays it bitwise);
    *  3. each source's target capped at `maxEpochs · tokens_s`;
    *  4. the capped surplus redistributed over UNCAPPED sources in one
    *     round, proportional to their shares (a second-round cap breach is
    *     possible by construction and left visible in `epochs` rather than
    *     silently water-filled; if every source caps, the shortfall stays
    *     unassigned — the budget is infeasible under the cap and the table
    *     shows it: Σ final_tokens < budget).
    *
    * Everything after the token count is |sources|-row arithmetic on
    * driver-collected 1-row totals (the broadcast-scalar pattern used by
    * temperatureSample above). Output: (stratum, n_docs, n_tokens, share,
    * target_tokens, capped, final_tokens, epochs).
    */
  def tokenBudgetMix(docs: DataFrame, strataCol: String, budgetTokens: Long,
                     maxEpochs: Double): DataFrame = {
    // localCheckpoint pins the |strata|-row aggregate so the THREE actions
    // below (Σpw, cap totals, the result) cost ONE corpus pass, not three —
    // the retained blob is |strata| rows (a mixing table: tens, not
    // millions), the price of not re-splitting every document per action
    val per = docs
      .select(col(strataCol).as("stratum"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .groupBy(col("stratum"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .withColumn("pw", sqrt(col("n_tokens").cast("double")))
      .localCheckpoint()
    // an empty corpus aggregates to ONE all-null row: read the total as an
    // Option so the plan degrades to an empty mix table instead of an NPE
    // deep inside getDouble (every downstream branch is row-wise, so a 0.0
    // total never divides anything — per has no rows to divide)
    val totRow = per.agg(sum(col("pw"))).head
    val totPw = if (totRow.isNullAt(0)) 0d else totRow.getDouble(0)
    val t1 = per
      .withColumn("share", col("pw") / lit(totPw))
      .withColumn("target_tokens", lit(budgetTokens.toDouble) * col("share"))
      .withColumn("cap_tokens", lit(maxEpochs) * col("n_tokens").cast("double"))
      // the cap decision is quantized BEFORE the comparison (the
      // temperature-sampler convention): target_tokens carries a float
      // total (Σ√tokens) whose last ulp can differ between engines, and a
      // source sitting exactly at its cap must not flip sides on that ulp.
      // 4 decimals matches the precision the table itself publishes.
      .withColumn("capped",
        when(round(col("target_tokens"), 4) > round(col("cap_tokens"), 4),
          lit(1L)).otherwise(lit(0L)))
    val caps = t1.agg(
      sum(when(col("capped") === 0L, col("share")).otherwise(lit(0d))),
      sum(when(col("capped") === 1L,
        col("target_tokens") - col("cap_tokens")).otherwise(lit(0d)))).head
    val uncappedShare = if (caps.isNullAt(0)) 0d else caps.getDouble(0)
    val surplus = if (caps.isNullAt(1)) 0d else caps.getDouble(1)
    t1.withColumn("final_tokens",
        when(col("capped") === 1L, col("cap_tokens"))
          .otherwise(col("target_tokens") +
            (if (uncappedShare > 0d)
               lit(surplus) * col("share") / lit(uncappedShare)
             else lit(0d))))
      .withColumn("epochs",
        round(col("final_tokens") / col("n_tokens").cast("double"), 6))
      .select(col("stratum"), col("n_docs"), col("n_tokens"),
        round(col("share"), 6).as("share"),
        round(col("target_tokens"), 4).as("target_tokens"), col("capped"),
        round(col("final_tokens"), 4).as("final_tokens"), col("epochs"))
  }

  /** Deterministic global shuffle for training order: position = rank of
    * `md5(salt || doc_id)`. Changing the salt re-shuffles; the same salt
    * always yields the same epoch order. The manifest is (position, doc_id)
    * only — materialize it once per epoch, never sort the payload.
    *
    * Scale shape: a range-partitioned total sort on the md5 key (what Spark's
    * `orderBy` already is), then rank WITHOUT a single-partition window:
    * `zipWithIndex` is the classic two-pass distributed rank — count rows per
    * sorted partition, broadcast cumulative offsets, add the local index.
    * One genuine RDD use: per-partition offset arithmetic has no Column form.
    */
  def shuffleOrder(docs: DataFrame, salt: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"))
      .withColumn("k", md5(concat_ws("|", lit(salt), col("doc_id"))))
      .orderBy(col("k"), col("doc_id"))
      .select(col("doc_id")).as[Long]
      .rdd.zipWithIndex
      .map { case (id, i) => (id, i + 1L) }
      .toDF("doc_id", "position")
  }

  /** Deterministic train/val/test holdout assignment: each document draws a
    * uniform `u ∈ [0,1)` from the salted md5 of its id (the first 8 hex
    * digits over 2³²) and lands in test (`u < testFrac`), val
    * (`u < testFrac + valFrac`), or train. RNG-free and id-stable — the
    * same doc keeps its split across engines, cluster sizes, reruns, and
    * corpus growth (adding documents never reshuffles existing
    * assignments, the property that keeps eval sets uncontaminated across
    * corpus versions). One narrow projection, no shuffle, no state.
    */
  def holdoutSplit(docs: DataFrame, valFrac: Double, testFrac: Double,
                   salt: String = "split"): DataFrame =
    docs.select(col("doc_id"), col("lang"),
      splitCol(col("doc_id"), valFrac, testFrac, salt).as("split"))

  /** The holdout label as a pure Column over an id — because the split is a
    * deterministic function of the id, consumers (leakage scans, per-split
    * filters) tag ids IN PLACE with no join against a materialized split
    * table: at 100 TB that's the difference between a projection and a
    * corpus-wide shuffle.
    */
  def splitCol(docId: Column, valFrac: Double, testFrac: Double,
               salt: String = "split"): Column = {
    val u = conv(substring(md5(concat(lit(salt + "|"),
        docId.cast("string"))), 1, 8), 16, 10)
      .cast("double") / lit(4294967296d)
    when(u < testFrac, "test")
      .when(u < testFrac + valFrac, "val")
      .otherwise("train")
  }
}
