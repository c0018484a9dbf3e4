package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE tokenizer APPLY — the encode half of the tokenizer story
  * (`llm_vocab_merges` is the fit half: it learns a ranked merge list; this
  * applies one). Token counts under the real merge table are what size a
  * training run: tokens-per-word fertility is the number a tokenizer is
  * judged by per language.
  *
  * Encoding algorithm: the classic result that BPE encode can be applied
  * merge-by-merge in rank order (a later merge can never create an earlier
  * merge's pair, because an earlier pair only references tokens that existed
  * before the later merge's output token was ever formed). Each merge is one
  * `replace` of the space-delimited symbol pair — applied twice, because a
  * single leftmost-nonoverlapping replace-all pass consumes the shared
  * boundary space between adjacent occurrences ("a b a b" matches once, not
  * twice); after one pass the surviving occurrences are never adjacent, so
  * the second pass reaches the fixpoint. `BpeSpec` pins this equivalence
  * against a reference one-merge-at-a-time implementation.
  *
  * Scale shape: the whole encode is ONE narrow codegen projection (a chain
  * of `StringReplace` expressions — no UDF, no explode, no shuffle);
  * per-document cost, embarrassingly parallel at any corpus size. Word
  * boundaries are kept as multi-space gaps that no single-space merge
  * pattern can cross, so no per-word explode is needed.
  */
object Bpe {

  /** A "pretrained" ranked merge table over the corpus alphabet — well
    * formed (every side is a character or the output of an earlier merge),
    * deep enough to build whole words (`spark`, `window`, `table`, `und`)
    * through 4–6 chained merges. In a real deployment this comes from the
    * tokenizer artifact; [[encode]] takes any list.
    */
  val PretrainedMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n", "e" -> "r", "o" -> "r",
    "a" -> "r", "s" -> "t", "j" -> "o", "jo" -> "in", "s" -> "c", "sc" -> "an",
    "h" -> "a", "ha" -> "s", "has" -> "h", "s" -> "p", "sp" -> "ar",
    "spar" -> "k", "w" -> "in", "win" -> "d", "wind" -> "o", "windo" -> "w",
    "t" -> "a", "ta" -> "b", "tab" -> "l", "tabl" -> "e", "d" -> "er",
    "u" -> "n", "un" -> "d", "l" -> "e")

  /** `text` → " c h a r s " with every character its own space-delimited
    * symbol; original spaces widen to ≥3-space word gaps no merge crosses.
    */
  def charSpaced(text: Column): Column =
    concat(lit(" "), regexp_replace(text, "(.)", "$1 "))

  /** Apply `merges` in rank order to a char-spaced column (two
    * leftmost-replace passes per merge = per-merge fixpoint, see object
    * doc).
    */
  def applyMerges(spaced: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(spaced) { case (acc, (x, y)) =>
      val pat = s" $x $y "
      val rep = s" $x$y "
      replace(replace(acc, lit(pat), lit(rep)), lit(pat), lit(rep))
    }

  /** Per-document encode audit: word count, post-BPE token count, and
    * fertility (tokens per word — 1.0 means every word became a single
    * token).
    */
  def encode(docs: DataFrame,
             merges: Seq[(String, String)] = PretrainedMerges): DataFrame = {
    val nWords = size(split(col("text"), " ")).cast("long")
    val encoded = applyMerges(charSpaced(col("text")), merges)
    val nTokens = size(split(trim(encoded), " +")).cast("long")
    docs.select(
      col("doc_id"),
      nWords.as("n_words"),
      nTokens.as("n_tokens"),
      round((nTokens * lit(1.0) / nWords).cast("decimal(28,10)"), 4)
        .cast("double").as("fertility"))
  }

  /** Per-language fertility rollup — THE multilingual tokenizer-equity
    * metric: a merge table trained on one language's statistics fragments
    * the others into more tokens per word, which directly taxes their
    * effective context length and training compute share.
    *
    * Scale shape: the encode projection followed by one |languages|-key
    * aggregation of two long sums (map-side combinable) — the ratio and
    * rounding happen on |languages| rows at the edge.
    */
  def fertilityByLang(docs: DataFrame,
                      merges: Seq[(String, String)] = PretrainedMerges): DataFrame = {
    val nWords = size(split(col("text"), " ")).cast("long")
    val encoded = applyMerges(charSpaced(col("text")), merges)
    val nTokens = size(split(trim(encoded), " +")).cast("long")
    docs.select(col("lang"), nWords.as("w"), nTokens.as("t"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("w")).as("total_words"), sum(col("t")).as("total_tokens"))
      .select(col("lang"), col("n_docs"), col("total_words"), col("total_tokens"),
        round((col("total_tokens") * lit(1.0) / col("total_words"))
          .cast("decimal(28,10)"), 4).cast("double").as("fertility"))
  }

  /** The same encode chain as DuckDB SQL over column `text`, built from the
    * SAME merge list so the oracle cannot drift from the implementation.
    * Returns an expression string yielding the encoded char-spaced text.
    */
  def encodeSql(merges: Seq[(String, String)] = PretrainedMerges): String =
    merges.foldLeft("' ' || regexp_replace(text, '(.)', '\\1 ', 'g')") {
      case (acc, (x, y)) =>
        s"replace(replace($acc, ' $x $y ', ' $x$y '), ' $x $y ', ' $x$y ')"
    }
}
