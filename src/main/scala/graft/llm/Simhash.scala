package graft.llm

import org.apache.spark.sql.DataFrame
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
  */
object Simhash {
  val Bits = 64
  val Bands = 4
  val BandBits: Int = Bits / Bands // 16

  /** Per-document band values: (doc_id, band ∈ [0,4), v ∈ [0, 2¹⁶)).
    *
    * WIDE aggregation: the 64 per-bit weighted sums are 64 aggregate columns
    * of ONE `groupBy(doc_id)` — partial aggregation collapses them map-side,
    * so the shuffle carries |docs| rows of 64 longs instead of exploding
    * every (doc, token) row 64× (which cost a 64×-bigger shuffle and a
    * second per-(doc, bit) shuffle in the previous shape).
    */
  def bandValues(docs: DataFrame): DataFrame = {
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
    val vCols = (0 until Bands).map { b =>
      (0 until BandBits).map { bit =>
        when(col(s"s${b * BandBits + bit}") > 0, 1L << bit).otherwise(0L)
      }.reduce(_ + _)
    }
    wide.select(col("doc_id"), posexplode(array(vCols: _*)).as(Seq("band", "v")))
      .withColumn("band", col("band").cast("int"))
  }

  /** Near-duplicate pairs at Hamming distance ≤ `maxDist` (must be <
    * `Bands`, else the pigeonhole guarantee breaks). Output: (d1, d2,
    * hamming).
    */
  def nearDupPairs(docs: DataFrame, maxDist: Int = 3): DataFrame = {
    require(maxDist < Bands, s"pigeonhole banding covers distance < $Bands only")
    val bv = bandValues(docs)
    val cands = bv.as("a")
      .join(bv.as("b"),
        col("a.band") === col("b.band") && col("a.v") === col("b.v") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    val sigs = bv.groupBy(col("doc_id"))
      .agg(transform(sort_array(collect_list(struct(col("band"), col("v")))),
        x => x.getField("v")).as("sig"))
    cands
      .join(sigs.select(col("doc_id").as("d1"), col("sig").as("sig1")), Seq("d1"))
      .join(sigs.select(col("doc_id").as("d2"), col("sig").as("sig2")), Seq("d2"))
      .withColumn("hamming",
        aggregate(zip_with(col("sig1"), col("sig2"), (x, y) => bit_count(x.bitwiseXOR(y))),
          lit(0), (acc, v) => acc + v))
      .filter(col("hamming") <= maxDist)
      .select(col("d1"), col("d2"), col("hamming"))
  }
}
