package graft.llm

import org.apache.spark.sql.DataFrame
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
}
