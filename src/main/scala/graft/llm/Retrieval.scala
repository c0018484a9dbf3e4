package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyword retrieval over the `documents` table — the corpus-side search
  * capability a curation stack needs for eval-set mining, targeted audits,
  * and "show me documents about X" debugging at corpus scale.
  */
object Retrieval {

  /** BM25 top-k (Robertson–Spärck Jones): classic probabilistic keyword
    * ranking with term saturation (`k1`) and length normalization (`b`).
    *
    * Scale shape: the token explode filters to the query terms BEFORE any
    * shuffle, so the per-(doc,term) aggregation only ever sees
    * |query-term occurrences| rows, with map-side partial combine; `df` and
    * the corpus (N, avgdl) statistics are tiny aggregates broadcast onto the
    * scored rows; per-document scores reduce with an exact DECIMAL sum and
    * the result is a `TakeOrderedAndProject` heap — no global sort, driver
    * traffic is k rows. At 100 TB the only full-corpus work is one narrow
    * scan (dl stats) and one filtered explode.
    *
    * Determinism: the per-term score is quantized to DECIMAL(18,9) before
    * the per-document sum (exact addition in any order), and ranking uses
    * the exact decimal total, so the top-k cut is engine-independent; `ln`
    * parity with DuckDB is established by the tf-idf/LM-score queries.
    */
  def bm25TopK(docs: DataFrame, queryTerms: Seq[String], k1: Double = 1.2,
               b: Double = 0.75, k: Int = 15): DataFrame = {
    val toks = split(col("text"), " ")
    // corpus stats: one narrow scan — N docs and exact total token count
    val stats = docs.select(size(toks).cast("long").as("dl"))
      .agg(count(lit(1)).cast("long").as("n"), sum(col("dl")).as("sumdl"))
      .select(col("n"), (col("sumdl").cast("double") / col("n")).as("avgdl"))
    // doc length rides through the explode so no join back to the corpus
    val hits = docs
      .select(col("doc_id"), size(toks).cast("long").as("dl"), explode(toks).as("term"))
      .filter(col("term").isInCollection(queryTerms))
    val tf = hits.groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).cast("long").as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).cast("long").as("df"))
    val idf = log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val norm = (col("tf") * (lit(k1) + lit(1.0))) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl")))
    tf.join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), (idf * norm).cast("decimal(18,9)").as("term_score"))
      .groupBy(col("doc_id"))
      .agg(sum(col("term_score")).as("score_dec"), count(lit(1)).cast("long").as("n_terms"))
      .orderBy(col("score_dec").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("n_terms"),
        round(col("score_dec").cast("decimal(28,10)"), 4).cast("double").as("score"))
  }
}
