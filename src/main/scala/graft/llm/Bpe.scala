package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BpeBroadcasts

/** BPE tokenizer APPLY — the encode half of the tokenizer story
  * (`llm_vocab_merges` is the fit half: it learns a ranked merge list; this
  * applies one). Token counts under the real merge table are what size a
  * training run: tokens-per-word fertility is the number a tokenizer is
  * judged by per language.
  *
  * Encoding is the native [[graft.functions.BpeTokenCount]] expression: per
  * word, iteratively merge the best-ranked adjacent pair against a
  * BROADCAST rank map until no pair is in the table — the algorithm real
  * tokenizers run, O(len · merges_applied) per word and INDEPENDENT of
  * vocab size in both plan shape and per-row work. (The previous
  * formulation — one chained `replace` per merge — was correct at the
  * 40-rule fixture but compiled a plan proportional to the merge table:
  * a production 50k-rule tokenizer would mean 100k nested string traversals
  * per document. It also mis-merged self-pair runs, see `BpeSpec`.)
  *
  * Scale shape: the whole encode is ONE narrow codegen projection (a single
  * scalar expression — no UDF, no explode, no shuffle); the merge table
  * ships once per executor as a broadcast, never in the plan; per-document
  * cost, embarrassingly parallel at any corpus size.
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

  /** Deterministically extend [[PretrainedMerges]] to a production-scale
    * ranked table of `n` rules, preserving well-formedness: the token pool
    * starts as the 26 base characters plus the pretrained outputs, and each
    * new rule pairs two existing pool tokens whose concatenation is a
    * brand-new string (so token strings stay unique and a later merge can
    * never re-create an earlier merge's pair — the property the iterative
    * encode's equivalence proof rests on). Self-pairs (x == y) are excluded
    * here because [[encodeCtesSql]]'s two-pass replace oracle is only sound
    * for x != y (see that method's doc); the ENGINE handles self-pairs
    * (`BpeSpec` pins a run-of-six case against the reference encoder).
    * An LCG drives the picks — no RNG, same table every run.
    */
  def largeMerges(n: Int): Seq[(String, String)] = {
    val pool = scala.collection.mutable.ArrayBuffer[String]() ++
      ('a' to 'z').map(_.toString)
    val produced = scala.collection.mutable.Set[String]() ++ pool
    val pairs = scala.collection.mutable.Set[(String, String)]()
    val out = scala.collection.mutable.ArrayBuffer[(String, String)]()
    for ((x, y) <- PretrainedMerges) {
      out += ((x, y)); pairs += ((x, y)); pool += x + y; produced += x + y
    }
    var state = 0x9e3779b97f4a7c15L
    def next(mod: Int): Int = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (((state >>> 33) % mod).toInt + mod) % mod
    }
    while (out.size < n) {
      val x = pool(next(pool.size))
      val y = pool(next(pool.size))
      val xy = x + y
      if (x != y && xy.length <= 24 && !produced.contains(xy) &&
          !pairs.contains((x, y))) {
        out += ((x, y)); pairs += ((x, y)); pool += xy; produced += xy
      }
    }
    out.toSeq
  }

  /** The default table the oracle queries encode under: the pretrained
    * rules (which do the real merging on this corpus) extended to 5 000 —
    * production-shape, so the suite exercises the vocab-size-independent
    * path, not a toy.
    */
  lazy val ProductionMerges: Seq[(String, String)] = largeMerges(5000)

  /** `bpe_token_count(text)` under `merges` — the native expression with
    * the rank map broadcast through `docs`'s session. The broadcast is
    * cached by merge-table content ([[BpeBroadcasts.registerCached]]), so
    * encoding many columns / frames / micro-batches against the same
    * tokenizer artifact ships and registers exactly ONE broadcast; call
    * [[graft.functions.BpeBroadcasts.unregister]] when a table is retired
    * to destroy its executor blocks.
    */
  def tokenCount(docs: DataFrame, text: Column,
                 merges: Seq[(String, String)]): Column = {
    graft.GraftExtensions.register(docs.sparkSession)
    val id = BpeBroadcasts.registerCached(docs.sparkSession, merges)
    call_function("bpe_token_count", text, lit(id))
  }

  /** Per-document encode audit: word count, post-BPE token count, and
    * fertility (tokens per word — 1.0 means every word became a single
    * token).
    */
  def encode(docs: DataFrame,
             merges: Seq[(String, String)] = ProductionMerges): DataFrame = {
    val nWords = size(split(col("text"), " ")).cast("long")
    val nTokens = tokenCount(docs, col("text"), merges)
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
                      merges: Seq[(String, String)] = ProductionMerges): DataFrame = {
    val nWords = size(split(col("text"), " ")).cast("long")
    val nTokens = tokenCount(docs, col("text"), merges)
    docs.select(col("lang"), nWords.as("w"), nTokens.as("t"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("w")).as("total_words"), sum(col("t")).as("total_tokens"))
      .select(col("lang"), col("n_docs"), col("total_words"), col("total_tokens"),
        round((col("total_tokens") * lit(1.0) / col("total_words"))
          .cast("decimal(28,10)"), 4).cast("double").as("fertility"))
  }

  /** The same encode as a DuckDB CTE chain over table `documents`, built
    * from the SAME merge list so the oracle cannot drift from the
    * implementation. The oracle applies merges one-by-one in rank order —
    * the classical equivalent of the engine's iterative best-rank encode
    * for well-formed tables — as two leftmost replace-all passes per merge
    * over a char-spaced text: pass 1 can skip an occurrence only when the
    * immediately preceding occurrence consumed its leading boundary space,
    * so skipped occurrences are isolated and pass 2 is a fixpoint. That
    * argument REQUIRES x != y (a self-pair run mis-merges under
    * non-overlapping leftmost matching no matter how many passes — the
    * engine handles those natively; `require`d away here).
    *
    * Merges are chunked `perCte` to a CTE so expression nesting stays
    * bounded (a single 10 000-deep nested `replace` would exceed parser
    * recursion). Emits CTE text ending in a table `encoded` with columns
    * `(doc_id, lang, n_words, t)` where `t` is the encoded char-spaced
    * text.
    */
  def encodeCtesSql(merges: Seq[(String, String)] = ProductionMerges,
                    perCte: Int = 20): String = {
    require(merges.forall { case (x, y) => x != y },
      "two-pass replace oracle is only sound for x != y merges")
    val base = "e0 AS (SELECT doc_id, lang, " +
      "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words, " +
      "' ' || regexp_replace(text, '(.)', '\\1 ', 'g') AS t FROM documents)"
    val groups = merges.grouped(perCte).toSeq
    val ctes = groups.zipWithIndex.map { case (g, i) =>
      val expr = g.foldLeft("t") { case (acc, (x, y)) =>
        s"replace(replace($acc, ' $x $y ', ' $x$y '), ' $x $y ', ' $x$y ')"
      }
      s"e${i + 1} AS (SELECT doc_id, lang, n_words, $expr AS t FROM e$i)"
    }
    (Seq(base) ++ ctes :+ s"encoded AS (SELECT * FROM e${groups.size})")
      .mkString(",\n")
  }
}
