package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash near-duplicate detection: a 64-bit locality-sensitive fingerprint
  * per document; near-duplicates are pairs within a small Hamming distance.
  *
  * Fingerprint: bit j is the sign of Σ_tokens tf · (2·bit_j(md5(token)) − 1)
  * (the classic Charikar construction with md5 as the token hash, so the
  * DuckDB oracle reproduces it exactly).
  *
  * Candidate generation is the pigeonhole band trick: the 64 bits split into
  * 4 × 16-bit bands; any pair at Hamming distance ≤ 3 MUST agree on ≥1 whole
  * band, so an equi-join on (band, value) finds every such pair with zero
  * recall loss — no n² pair scan, and the join is a plain shuffled hash join
  * that scales like the number of colliding docs per band value.
  *
  * Plan shape (the 100-TB concern): ONE wide aggregation produces the whole
  * fingerprint as a single long; band values are shift/mask projections of
  * it, and the fingerprint rides along through the candidate join so the
  * Hamming verify is `bit_count(fp1 XOR fp2)` — no signature re-aggregation
  * and no join back to a signature table. Total: one doc-keyed shuffle, one
  * (band, value)-keyed self-join (its exchange reused for both sides), one
  * pair distinct.
  */
object Simhash {
  val Bits = 64
  val Bands = 4
  val BandBits: Int = Bits / Bands // 16
  private val BandMask = (1L << BandBits) - 1

  /** Per-document 64-bit fingerprint: (doc_id, fp). Fingerprint bit j is
    * set iff the j-th weighted bit-sum is positive.
    *
    * WIDE aggregation: the 64 per-bit weighted sums are 64 aggregate columns
    * of ONE `groupBy(doc_id)` — partial aggregation collapses them map-side,
    * so the shuffle carries |docs| rows of 64 longs instead of exploding
    * every (doc, token) row 64× (which cost a 64×-bigger shuffle and a
    * second per-(doc, bit) shuffle in the previous shape).
    */
  def fingerprints(docs: DataFrame): DataFrame = {
    // Per-INSTANCE contributions: Σ_instances (bit·2−1) ≡ Σ_tokens tf·(bit·2−1),
    // so the intermediate per-(doc, token) tf aggregation (an extra shuffle)
    // is unnecessary — one groupBy(doc_id) with 64 wide sums does it all,
    // map-side combined.
    // Two 32-bit halves of the md5 prefix parsed ONCE per token instance;
    // bit j then costs one shift+mask instead of a per-bit substring+conv
    // (64 string parses per instance was >80% of this operator's CPU).
    // Identical bit values: digit d of a 32-bit half contributes at integer
    // bit (7-d)*4 + (3 - j%4) = 31 - j.
    val inst = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("h", md5(col("tok")))
      .withColumn("h1", expr("cast(conv(substring(h, 1, 8), 16, 10) as bigint)"))
      .withColumn("h2", expr("cast(conv(substring(h, 9, 8), 16, 10) as bigint)"))
    val sCols = (0 until Bits).map { j =>
      val half = if (j < 32) "h1" else "h2"
      val bit = expr(s"cast(shiftright($half, ${31 - j % 32}) & 1 as int)")
      sum(bit * 2 - 1).as(s"s$j")
    }
    val wide = inst.groupBy(col("doc_id")).agg(sCols.head, sCols.tail: _*)
    // Bitwise OR of distinct powers of two — no additive-overflow edge at
    // bit 63, and the band layout below is a pure shift/mask of this long.
    val fp = (0 until Bits)
      .map(j => when(col(s"s$j") > 0, lit(1L << j)).otherwise(0L))
      .reduce[Column](_ bitwiseOR _)
    wide.select(col("doc_id"), fp.as("fp"))
  }

  /** Band value b of a fingerprint column: bits [b·16, b·16+16) as a long.
    * (Arithmetic shift is fine — the mask drops any sign-extension bits.)
    */
  private def bandOf(fp: Column, b: Int): Column =
    shiftright(fp, b * BandBits).bitwiseAND(lit(BandMask))

  /** Per-document band values with the fingerprint alongside:
    * (doc_id, fp, band ∈ [0,4), v ∈ [0, 2¹⁶)).
    */
  def bandValues(docs: DataFrame): DataFrame =
    bandValuesOf(fingerprints(docs))

  /** The band projection over ANY 64-bit fingerprint table (doc_id, fp) —
    * the candidate machinery is fingerprint-agnostic, so the image dHash
    * path ([[Multimodal.dHash]]) shares it instead of re-implementing the
    * pigeonhole join.
    */
  def bandValuesOf(fps: DataFrame): DataFrame =
    fps.select(col("doc_id"), col("fp"),
      posexplode(array((0 until Bands).map(b => bandOf(col("fp"), b)): _*))
        .as(Seq("band", "v")))
      .withColumn("band", col("band").cast("int"))

  /** Near-duplicate pairs at Hamming distance ≤ `maxDist` (must be <
    * `Bands`, else the pigeonhole guarantee breaks). Output: (d1, d2,
    * hamming).
    *
    * `maxBandDf`: skew guard for corpus scale, same design as
    * [[Dedup.nearDupPairs]]'s stop-shingle cap. A degenerate band value
    * shared by f documents (think: millions of near-empty docs whose
    * weighted sums all land negative → band value 0) makes the self-join
    * emit f² candidate rows for that bucket. With a cap, (band, value)
    * buckets with document frequency > cap are dropped from candidate
    * generation — the hot-bucket set is tiny by construction (≤ 4·|docs|/cap
    * values), so the filter is a broadcast anti-join, no extra shuffle of
    * the band table. Trade-off (document before enabling): a pair whose
    * ONLY agreeing band is a dropped bucket is missed, so the zero-recall-
    * loss guarantee narrows to pairs that agree on ≥1 cold band. Default
    * None = exact, for oracle parity.
    */
  def nearDupPairs(docs: DataFrame, maxDist: Int = 3,
                   maxBandDf: Option[Int] = None): DataFrame =
    nearDupPairsOf(fingerprints(docs), maxDist, maxBandDf)

  /** [[nearDupPairs]] over a caller-supplied fingerprint table (doc_id,
    * fp) — the banding, skew cap, and Hamming verify are identical for any
    * 64-bit LSH fingerprint (text SimHash, image dHash, ...).
    */
  def nearDupPairsOf(fps: DataFrame, maxDist: Int = 3,
                     maxBandDf: Option[Int] = None): DataFrame = {
    require(maxDist < Bands, s"pigeonhole banding covers distance < $Bands only")
    val bv0 = bandValuesOf(fps)
    val bv = maxBandDf match {
      case Some(cap) =>
        val hot = bv0.groupBy(col("band"), col("v"))
          .agg(count(lit(1)).as("df")).filter(col("df") > cap)
        bv0.join(broadcast(hot.select(col("band"), col("v"))),
          Seq("band", "v"), "left_anti")
      case None => bv0
    }
    bv.as("a")
      .join(bv.as("b"),
        col("a.band") === col("b.band") && col("a.v") === col("b.v") &&
          col("a.doc_id") < col("b.doc_id"))
      // fp is functionally dependent on doc_id, so carrying it through the
      // distinct costs nothing and saves the two signature joins.
      .select(col("a.doc_id").as("d1"), col("a.fp").as("fp1"),
        col("b.doc_id").as("d2"), col("b.fp").as("fp2"))
      .distinct()
      .withColumn("hamming", bit_count(col("fp1").bitwiseXOR(col("fp2"))).cast("int"))
      .filter(col("hamming") <= maxDist)
      .select(col("d1"), col("d2"), col("hamming"))
  }
}
