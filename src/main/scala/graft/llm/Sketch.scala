package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cardinality sketches: fixed-size distinct-count state for corpus
  * profiling where an exact `count(DISTINCT …)` would shuffle every distinct
  * value. The HLL here is deliberately deterministic (md5-derived hash, no
  * engine-private seeding) so any engine replaying the same formula lands on
  * the same registers — the estimate itself is cross-checkable, not just the
  * exact side.
  */
object Sketch {

  /** HyperLogLog distinct estimate per group (Flajolet et al. 2007), audited
    * against the exact distinct count.
    *
    * Hash: the top 60 bits of md5(item) (15 hex chars — fits a signed long).
    * The top `p` bits pick the register; the rank is the leading-zero count
    * of the remaining `60-p` bits plus one, computed integer-exactly via the
    * binary-string length (no floating log2 at bucket boundaries). Registers
    * reduce with `max` — map-side combinable, m=2^p longs of state per group
    * no matter the corpus size; that fixed state is the whole point at
    * 100 TB, where the exact side's distinct shuffle is the cost you're
    * avoiding (it is computed here only as the audit column).
    *
    * Estimate: alpha_m * m^2 / sum(2^-reg) with empty registers counting
    * 2^0, and the standard linear-counting fallback m*ln(m/V) when the raw
    * estimate is under 2.5m with V empty registers. 2^-reg terms are exact
    * powers of two spanning < 55 exponents, so the double sum is exact and
    * engine-independent.
    */
  def hllDistinct(items: DataFrame, groupCol: String, itemCol: String,
                  p: Int = 6): DataFrame = {
    require(p >= 4 && p <= 14, s"p must be in [4, 14], got $p")
    val m = 1 << p
    val wBits = 60 - p
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val h = conv(substring(md5(col(itemCol).cast("binary")), 1, 15), 16, 10).cast("long")
    val bucket = shiftright(h, wBits).as("bucket")
    val w = h.bitwiseAND(lit((1L << wBits) - 1))
    // bit length of w = length of its minimal binary form; ltrim('0') also
    // normalizes engines that zero-pad bin() — and maps w=0 to length 0,
    // giving the max rank wBits+1 as HLL requires
    val rank = (lit(wBits + 1) - length(ltrim(bin(w), "0"))).as("rank")
    val regs = items.select(col(groupCol), bucket, rank)
      .groupBy(col(groupCol), col("bucket")).agg(max(col("rank")).as("reg"))
    val perGroup = regs.groupBy(col(groupCol))
      .agg(sum(pow(lit(2.0), -col("reg"))).as("sum_present"),
        count(lit(1)).as("n_present"))
      .select(col(groupCol), (lit(m) - col("n_present")).as("zeros"),
        (col("sum_present") + (lit(m) - col("n_present")).cast("double")).as("z"))
    val raw = lit(alpha) * lit(m.toDouble) * lit(m.toDouble) / col("z")
    val est = when(raw <= lit(2.5 * m) && col("zeros") > 0,
      lit(m.toDouble) * log(lit(m.toDouble) / col("zeros"))).otherwise(raw)
    val exact = items.groupBy(col(groupCol))
      .agg(countDistinct(col(itemCol)).as("n_exact"))
    exact.join(perGroup, groupCol)
      .select(col(groupCol), col("n_exact"),
        round(est.cast("decimal(28,10)"), 4).cast("double").as("hll_est"),
        round((abs(est - col("n_exact")) / col("n_exact")).cast("decimal(28,10)"), 4)
          .cast("double").as("rel_err"))
  }

  /** Count-min sketch frequency estimates (Cormode & Muthukrishnan 2005) for
    * the exact top-k heavy hitters, audited against their true counts.
    *
    * The sketch is `d`×`w` counters — fixed state no matter the corpus size,
    * built in ONE map-side-combinable aggregation over the exploded items
    * (each occurrence contributes to d counters via d salted md5 hashes).
    * The estimate for a probe item is the MIN of its d counters; count-min
    * never underestimates, so `overcount = cms_est - n_exact >= 0` always.
    * All arithmetic is integer — cross-engine parity is exact by
    * construction.
    *
    * At 100 TB the d×w counter table replaces a full |vocab|-key shuffle for
    * approximate frequency queries; the exact top-k side here is the audit
    * (itself a `TakeOrderedAndProject` heap, not a global sort). The probe
    * join broadcasts the d×w-row sketch onto k×d probe rows.
    */
  def countMinTopK(items: DataFrame, itemCol: String, d: Int = 4,
                   w: Int = 256, k: Int = 20): DataFrame = {
    require(d >= 1 && d <= 8 && w >= 16, s"bad sketch shape d=$d w=$w")
    def bucket(r: Int, item: Column): Column =
      pmod(conv(substring(md5(concat(lit(s"cms$r|"), item).cast("binary")), 1, 15),
        16, 10).cast("long"), lit(w.toLong))
    val buckets = (0 until d).map(r => bucket(r, col(itemCol)))
    val sketch = items
      .select(posexplode(array(buckets: _*)).as(Seq("row", "bucket")))
      .groupBy(col("row"), col("bucket"))
      .agg(count(lit(1)).as("counter"))
    val top = items.groupBy(col(itemCol).as("item"))
      .agg(count(lit(1)).cast("long").as("n_exact"))
      .orderBy(col("n_exact").desc, col("item"))
      .limit(k)
    val probes = top.select(col("item"), col("n_exact"),
      posexplode(array((0 until d).map(r => bucket(r, col("item"))): _*))
        .as(Seq("row", "bucket")))
    probes.join(broadcast(sketch), Seq("row", "bucket"))
      .groupBy(col("item"), col("n_exact"))
      .agg(min(col("counter")).cast("long").as("cms_est"))
      .select(col("item"), col("n_exact"), col("cms_est"),
        (col("cms_est") - col("n_exact")).as("overcount"))
  }

  /** Fixed-histogram quantile sketch per group, audited against the exact
    * interpolated quantiles.
    *
    * State is `nBuckets` counters per group no matter how many values flow
    * in — built in one map-side-combinable aggregation. The estimate for
    * quantile q is the UPPER EDGE of the first bucket whose cumulative count
    * reaches q·n: a deterministic, rank-true bound whose error is at most
    * `bucketWidth` (the audit columns show the realized gap). The exact side
    * (`percentile` / DuckDB `quantile_cont`) needs the full value multiset —
    * at 100 TB that is the sort-shaped cost the histogram avoids; here it is
    * computed as the audit.
    *
    * The cumulative scan runs per group over ≤ `nBuckets` rows — the window
    * is bounded by sketch size, not data size. Determinism: counts are
    * integers, `q·n` is the same IEEE product in any engine, and bucket
    * edges are integers, so the estimate is exact cross-engine; the exact
    * quantile's interpolation parity is established by `llm_corpus_stats`.
    */
  def histQuantiles(items: DataFrame, groupCol: String, valueCol: String,
                    bucketWidth: Int = 4, nBuckets: Int = 1024,
                    qs: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    require(bucketWidth >= 1 && nBuckets >= 2, s"bad shape $bucketWidth/$nBuckets")
    import org.apache.spark.sql.expressions.Window
    def pName(q: Double): String = s"p${(q * 100).toInt}"
    val bucket = least(floor(col(valueCol) / lit(bucketWidth)).cast("long"),
      lit(nBuckets - 1L))
    val hist = items.select(col(groupCol), bucket.as("bucket"))
      .groupBy(col(groupCol), col("bucket")).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("bucket"))
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col(groupCol))))
    val ests = cum.groupBy(col(groupCol))
      .agg(max(col("n")).as("n"),
        qs.map(q => min(when(col("cum") >= lit(q) * col("n"),
          (col("bucket") + lit(1L)) * lit(bucketWidth.toLong)))
          .as(s"${pName(q)}_est")): _*)
    val exacts = items.groupBy(col(groupCol))
      .agg(expr(s"percentile($valueCol, ${qs.head})").as(s"${pName(qs.head)}_exact"),
        qs.tail.map(q =>
          expr(s"percentile($valueCol, $q)").as(s"${pName(q)}_exact")): _*)
    ests.join(exacts, groupCol)
      .select(col(groupCol) +: col("n") +: qs.flatMap(q => Seq(
        round(col(s"${pName(q)}_exact").cast("decimal(28,10)"), 4)
          .cast("double").as(s"${pName(q)}_exact"),
        col(s"${pName(q)}_est"))): _*)
  }
}
