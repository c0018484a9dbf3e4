package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table: token counting,
  * quality scoring, marker-based language ID, all as codegen-friendly column
  * expressions (one narrow projection, no shuffle — the shape you want in
  * front of a 100-TB corpus filter).
  */
object TextStats {

  /** English-ish stopword markers present in the synthetic vocabulary; the
    * marker sets are config in a real deployment.
    */
  val StopWords: Seq[String] = Seq("the", "a", "of", "and", "in", "to")

  /** Marker word sets per language for the heuristic classifier. */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and"),
    "de" -> Seq("der", "die", "das", "und"),
    "es" -> Seq("el", "la", "los", "y"),
    "fr" -> Seq("le", "la", "les", "et"))

  private def tokens: Column = split(col("text"), " ")

  /** BPE-style pre-tokenizer regex (letter runs / digit runs / punctuation
    * runs — the GPT-2 pre-split shape without the contraction cases). Kept to
    * syntax RE2 and java.util.regex interpret identically so the DuckDB
    * oracle counts the same tokens.
    */
  val BpeTokenRegex = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"

  /** Per-document stats: token count, distinct tokens, average token length,
    * stopword ratio, and a [0,1] quality score = vocabulary-richness ×
    * (1 − stopword share) — the length/punct/stopword family of heuristic
    * quality filters used to gate training corpora.
    */
  def stats(docs: DataFrame): DataFrame = {
    val nTok = size(tokens)
    val nDis = size(array_distinct(tokens))
    // single-space separated text: total token chars = chars - (n-1) separators
    val avgLen = (length(col("text")) - nTok + 1).cast("double") / nTok
    val stopRatio = size(filter(tokens, t => t.isInCollection(StopWords))).cast("double") / nTok
    docs.select(
      col("doc_id"),
      nTok.as("n_tokens"),
      regexp_count(col("text"), lit(BpeTokenRegex)).cast("long").as("n_bpe_tokens"),
      nDis.as("n_distinct"),
      round(avgLen, 4).as("avg_token_len"),
      round(stopRatio, 4).as("stop_ratio"),
      round(least(nDis.cast("double") / 25d, lit(1d)) * (lit(1d) - stopRatio), 4).as("quality"))
  }

  /** Heuristic language ID: count marker-word hits per language, pick the
    * argmax (ties and zero hits → "und"), deterministic tiebreak by language
    * code. Output: (doc_id, labeled lang, predicted, en_hits).
    */
  def langId(docs: DataFrame): DataFrame = {
    val scores = LangMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      struct(size(filter(tokens, t => t.isInCollection(markers))).as("hits"),
        lit(lang).as("lang"))
    }
    // argmax by (hits, lang desc) = array_max over structs (hits first field)
    val best = array_max(array(scores: _*))
    docs.select(
      col("doc_id"),
      col("lang"),
      when(best.getField("hits") > 0, best.getField("lang")).otherwise("und").as("predicted"),
      size(filter(tokens, t => t.isInCollection(LangMarkers("en")))).as("en_hits"))
  }

  /** Within-document repetition: the duplicated word-n-gram fraction
    * (`1 − distinct/total` over the doc's own n-grams) — the Gopher-family
    * boilerplate/repetition quality signal. Entirely narrow: the gram array
    * is built and deduplicated inside one projection, no explode, no
    * shuffle — per-document cost, embarrassingly parallel at any corpus
    * size. Docs shorter than n grams score 0 with n_grams = 0.
    */
  def repetition(docs: DataFrame, n: Int = 3): DataFrame = {
    graft.GraftExtensions.register(docs.sparkSession)
    val total = greatest(size(col("w")) - (n - 1), lit(0))
    // native distinct_ngrams (graft.functions.DistinctNGrams): one hashed
    // pass per row inside codegen, replacing the interpreted
    // array_distinct(transform(...)) gram materialization
    val distinctG = call_function("distinct_ngrams", col("w"), lit(n))
    docs.select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(
        col("doc_id"),
        total.cast("long").as("n_grams"),
        distinctG.cast("long").as("n_distinct_grams"),
        // decimal-hop: integer/integer ratio can land on a 6-dp half
        when(total === 0, lit(0d)).otherwise(
          round((lit(1d) - distinctG / total.cast("double"))
            .cast("decimal(28,10)"), 6).cast("double")).as("dup_frac"))
  }

  /** The composed corpus filter — the operator a 100-TB cleaning campaign
    * actually runs: length window, stopword ceiling, vocabulary-quality
    * floor, repetition ceiling, and language-consistency check fused into
    * ONE narrow projection (a single whole-stage-codegen pass over the
    * scan, no shuffle, no intermediate materialization). Emits keep/drop
    * plus the comma-joined reasons so rejects are auditable.
    */
  def qualityGate(docs: DataFrame, minTokens: Int = 20, maxTokens: Int = 2000,
                  maxStopRatio: Double = 0.5, minQuality: Double = 0.2,
                  maxDupFrac: Double = 0.8, gramN: Int = 3,
                  retainCols: Seq[String] = Nil): DataFrame = {
    val w = col("w")
    val nTok = size(w)
    val nDis = size(array_distinct(w))
    val stopRatio = round(
      size(filter(w, t => t.isInCollection(StopWords))).cast("double") / nTok, 4)
    val quality = round(
      least(nDis.cast("double") / 25d, lit(1d)) *
        (lit(1d) - size(filter(w, t => t.isInCollection(StopWords))).cast("double") / nTok), 4)
    graft.GraftExtensions.register(docs.sparkSession)
    val dupFrac = when(size(w) < gramN, lit(0d)).otherwise(
      round((lit(1d) - call_function("distinct_ngrams", w, lit(gramN)) /
          (size(w) - (gramN - 1)).cast("double"))
        .cast("decimal(28,10)"), 6).cast("double"))
    val best = array_max(array(LangMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      struct(size(filter(w, t => t.isInCollection(markers))).as("hits"),
        lit(lang).as("lang"))
    }: _*))
    val predicted = when(best.getField("hits") > 0, best.getField("lang")).otherwise("und")
    // every signal and the verdict evaluate inside ONE projection over the
    // scan — whole-stage codegen end to end; thresholds compare the same
    // rounded values the standalone stats/repetition operators emit
    val checks = Seq(
      (nTok < minTokens, "too_short"),
      (nTok > maxTokens, "too_long"),
      (stopRatio > maxStopRatio, "stopword_heavy"),
      (quality < minQuality, "low_quality"),
      (dupFrac > maxDupFrac, "repetitive"),
      (predicted =!= col("lang") && predicted =!= "und", "lang_mismatch"))
    val reasons = array(checks.map { case (c, tag) => when(c, tag) }: _*)
    // retainCols lets a downstream stage (e.g. streaming dedup) keep its
    // inputs without a stream-to-stream re-join, which Spark disallows.
    // Columns the projection already carries (doc_id, lang) are filtered out
    // of the retain list per projection — a duplicate same-exprId attribute
    // only happens to resolve today because Spark dedups it, and that is
    // fragile against aliased/computed callers.
    val retainedIn = retainCols.filterNot(Set("doc_id", "lang"))
    val retainedOut = retainCols.filterNot(_ == "doc_id")
    docs.select(col("doc_id") +: col("lang") +: split(col("text"), " ").as("w") +:
        retainedIn.map(col): _*)
      .select(col("doc_id") +:
        array_join(filter(reasons, v => v.isNotNull), ",").as("reasons") +:
        retainedOut.map(col): _*)
      .withColumn("keep", (col("reasons") === "").cast("long"))
  }

  /** TF-IDF top-k terms per document — the classic keyword/fingerprint
    * profile over a corpus. Two aggregations: term frequency per (doc, term)
    * and document frequency per term; `idf = ln((N+1)/(df+1))` (smoothed so
    * corpus-universal terms score 0 rather than diverging), then a per-doc
    * top-k by `(score desc, term asc)` — deterministic under ties.
    *
    * Scale shape: the tf agg shuffles on (doc_id, term) — the same key space
    * as the shingle table, map-side combined; the df table is |vocabulary|
    * rows, orders of magnitude smaller than the corpus, and is BROADCAST
    * back onto tf. The per-doc top-k window partitions by doc_id — no global
    * sort, and each partition holds one document's vocabulary.
    */
  def tfidfTopTerms(docs: DataFrame, k: Int = 3): DataFrame = {
    // corpus size as a broadcast 1-row aggregate (the bm25TopK pattern) —
    // the previous driver-side `docs.count()` ran a SEPARATE full corpus
    // scan before the query even started (r15, guide §1.2: one pass)
    val nDocs = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val tf = docs.select(col("doc_id"), explode(tokens).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // rank on the RAW double (ties are exact cross-engine: equal (tf, df)
    // give the identical double; ln's last-ulp engine skew can't reorder
    // distinct scores), round only at the output edge — 4 dp because ln is
    // transcendental and JVM/libm differ in the last ulp.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("score_raw").desc, col("term"))
    tf.join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score_raw", col("tf") * log((col("n_docs") + 1d) / (col("df") + 1d)))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("rk").cast("long").as("rk"), col("term"),
        round(col("score_raw"), 4).as("score"))
  }

  /** Tokenizer-fit statistics: the global token frequency table and the
    * adjacent-pair (bigram) frequency table — the two inputs of a BPE-style
    * merge step (the most frequent pair is the next merge candidate). Emits
    * the top-k of each, tagged `unigram` / `pair`, deterministic under ties
    * by (count desc, token asc).
    *
    * Scale shape: both branches are explode → hash-agg on the term key —
    * map-side combined, one shuffle each over the vocabulary (not the
    * corpus); the pair array is built positionally inside the projection
    * (no self-join). The top-k compiles to `TakeOrderedAndProject`, so no
    * global sort ever materializes.
    */
  def vocabMerges(docs: DataFrame, k: Int = 20): DataFrame = {
    val toks = docs.select(split(col("text"), " ").as("w"))
    def topK(terms: DataFrame, kind: String): DataFrame =
      terms.groupBy(col("token"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token"))
        .limit(k)
        .select(lit(kind).as("kind"), col("token"), col("cnt"))
    val uni = topK(toks.select(explode(col("w")).as("token")), "unigram")
    val pairs = topK(
      toks.select(explode(
        expr("transform(slice(w, 1, size(w) - 1), (t, i) -> concat(t, ' ', w[i + 1]))"))
        .as("token")), "pair")
    uni.unionAll(pairs)
  }

  /** Corpus-level rollup by language: document/source counts, total token
    * volume, exact median document length, and mean quality — the reporting
    * table a data-mix decision reads. One `groupBy(lang)` with partial
    * (map-side) aggregation; the mean accumulates in DECIMAL so the sum is
    * order-independent (double addition is not associative and a 1000-way
    * cluster would sum in a different order every run).
    */
  def corpusStats(docs: DataFrame): DataFrame = {
    val w = split(col("text"), " ")
    val nTok = size(w)
    val stop = size(filter(w, t => t.isInCollection(StopWords))).cast("double") / nTok
    val quality = round(
      least(size(array_distinct(w)).cast("double") / 25d, lit(1d)) * (lit(1d) - stop), 4)
    docs
      .select(col("lang"), col("source"), nTok.cast("long").as("n_tokens"),
        quality.cast("decimal(18,6)").as("q"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        sum(col("n_tokens")).as("total_tokens"),
        expr("percentile(n_tokens, 0.5)").as("median_tokens"),
        (sum(col("q")).cast("double") / count(lit(1))).as("mean_q_raw"))
      .select(col("lang"), col("n_docs"), col("n_sources"), col("total_tokens"),
        col("median_tokens").cast("double").as("median_tokens"),
        round(col("mean_q_raw"), 4).as("mean_quality"))
  }

  /** CCNet-style unigram language-model quality score: each document's mean
    * token log-probability under the corpus's own unigram distribution —
    * boilerplate scores high (common tokens), gibberish scores low (rare
    * tokens); the published pipeline buckets documents by this score before
    * training-mix assembly. CCNet scores against an externally trained
    * KenLM; the engine-side operator is the same shape with the corpus
    * unigram table standing in for the model file (a broadcast
    * (token, logp) table either way).
    *
    * Scale shape: one explode→hash-agg over the VOCABULARY builds the LM
    * (map-side combined), scoring joins the token stream to the broadcast
    * table and aggregates per doc — no self-join, no window, two shuffles
    * total. Cross-engine determinism: each per-token term is quantized to
    * DECIMAL(18,9) (absorbing libm ln's last-ulp skew) and summed EXACTLY
    * (order-independent), the mean rounded only at the output edge.
    */
  def unigramLogProb(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val lm = toks.groupBy(col("tok")).agg(count(lit(1)).as("tf"))
      .crossJoin(broadcast(toks.agg(count(lit(1)).as("n_total"))))
      .select(col("tok"),
        log(col("tf").cast("double") / col("n_total")).cast("decimal(18,9)").as("logp"))
    toks.join(broadcast(lm), Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        (sum(col("logp")).cast("double") / count(lit(1))).as("raw"))
      .select(col("doc_id"), col("n_tokens"), round(col("raw"), 4).as("mean_logp"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): each document
    * tagged head/middle/tail by LM score WITHIN its language — CCNet keeps
    * head+middle as the quality cut and trains on the split. Scores come
    * from [[unigramLogProb]] (CCNet uses a KenLM perplexity; the bucketing
    * contract is the same), mapped to a fixed integer grid
    * (`floor(-mean_logp · grid)`, clamped to `nBuckets`), and the tercile
    * thresholds are read off a per-language HISTOGRAM of that grid — the
    * fixed-state sketch discipline of `llm_quantile_sketch`, not a
    * per-language sort: the histogram is ≤ |langs|·nBuckets rows however
    * large the corpus, thresholds broadcast back, and each doc tags in one
    * projection. (CCNet itself pays a per-shard sort; at 100 TB a dominant
    * language would serialize through that sort — the histogram form keeps
    * the corpus pass shuffle-free beyond the score join.) All threshold
    * comparisons are integer (`cum·3 ≥ n`, `cum·3 ≥ 2n`), so engines agree
    * exactly. Output: (doc_id, lang, ppl_grid, ppl_bucket).
    */
  def pplBuckets(docs: DataFrame, grid: Int = 100, nBuckets: Int = 2048): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = unigramLogProb(docs)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .withColumn("g",
        least(floor(-col("mean_logp") * grid).cast("long"), lit(nBuckets - 1L)))
    val hist = scored.groupBy(col("lang"), col("g")).agg(count(lit(1)).as("cnt"))
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy(col("lang")).orderBy(col("g"))))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("lang"))))
    val th = cum.groupBy(col("lang")).agg(
      min(when(col("cum") * 3 >= col("n"), col("g"))).as("t33"),
      min(when(col("cum") * 3 >= col("n") * 2, col("g"))).as("t66"))
    scored.join(broadcast(th), Seq("lang"))
      .withColumn("ppl_bucket",
        when(col("g") <= col("t33"), lit("head"))
          .when(col("g") <= col("t66"), lit("middle"))
          .otherwise(lit("tail")))
      .select(col("doc_id"), col("lang"), col("g").as("ppl_grid"), col("ppl_bucket"))
  }

  /** Bigram conditional language-model score — the order-2 refinement of
    * [[unigramLogProb]] (CCNet's KenLM step is an order-5 version of exactly
    * this shape): each document's mean log P(w2|w1) under the corpus's own
    * Laplace-smoothed bigram distribution, logp(w1 w2) =
    * ln(c(w1 w2) + 1) − ln(c(w1 ·) + V). Repetitive boilerplate scores
    * high, token soup scores low, and unlike the unigram score a document
    * of common-but-shuffled tokens no longer scores well.
    *
    * Scale shape: bigram FORMATION stays inside one projection
    * (`transform` over the token array — no explode-self-join, no window,
    * no shuffle to form pairs). The bigram inventory is |V|²-bounded, NOT
    * broadcastable at corpus scale, so the scoring join shuffles BOTH sides
    * by the bigram key (plain hash join) — the honest 100-TB plan; the
    * unigram-sized prefix-count and vocab tables do broadcast. Per-pair
    * terms quantize to DECIMAL(18,9) and sum exactly, as in the unigram
    * operator. Documents with fewer than two tokens have no bigrams and are
    * absent from the output (same convention as the pair-less dedup rows).
    */
  def bigramLogProb(docs: DataFrame): DataFrame = {
    val t = docs.select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 2)
    val bg = t.select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(w) - 2), " +
          "i -> struct(concat(w[i], ' ', w[i + 1]) AS b, w[i] AS w1))")).as("p"))
      .select(col("doc_id"), col("p.b").as("b"), col("p.w1").as("w1"))
    val vocab = docs.select(explode(split(col("text"), " ")).as("tok"))
      .agg(countDistinct(col("tok")).as("v"))
    val prefix = bg.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val lm = bg.groupBy(col("b"))
      .agg(min(col("w1")).as("w1"), count(lit(1)).as("cb"))
      .join(broadcast(prefix), Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("b"),
        (log(col("cb") + lit(1d)) - log(col("c1") + col("v")))
          .cast("decimal(18,9)").as("logp"))
    bg.join(lm, Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        (sum(col("logp")).cast("double") / count(lit(1))).as("raw"))
      .select(col("doc_id"), col("n_bigrams"), round(col("raw"), 4).as("mean_logp"))
  }

  /** DSIR-style importance weights for target-distribution data selection
    * (Xie et al., "Data Selection for Language Models via Importance
    * Resampling", NeurIPS 2023): per-token log importance ratio between a
    * TARGET slice's unigram distribution and the raw corpus distribution
    * (Laplace-smoothed), summed per document and length-normalized. A
    * positive weight reads "more target-like than corpus average"; the
    * resampler keeps documents proportional to the weight — the
    * deterministic variant here flags the positive-weight slice. The
    * paper's hashed n-gram features collapse to plain tokens on a bounded
    * vocabulary (the hash step is the identity).
    *
    * Same 100-TB shape as [[unigramLogProb]]: vocabulary-keyed aggregation,
    * broadcast ratio table onto the token stream, decimal-exact sums.
    */
  def dsirWeights(docs: DataFrame, isTarget: org.apache.spark.sql.Column): DataFrame = {
    val toks = docs.select(col("doc_id"), isTarget.as("is_target"),
      explode(split(col("text"), " ")).as("tok"))
    val stats = toks.agg(
      count(lit(1)).as("n_raw"),
      sum(when(col("is_target"), 1L).otherwise(0L)).as("n_tgt"),
      countDistinct(col("tok")).as("v"))
    val ratios = toks.groupBy(col("tok"))
      .agg(count(lit(1)).as("tf_raw"),
        sum(when(col("is_target"), 1L).otherwise(0L)).as("tf_tgt"))
      .crossJoin(broadcast(stats))
      .select(col("tok"),
        (log((col("tf_tgt") + lit(1d)) / (col("n_tgt") + col("v"))) -
          log((col("tf_raw") + lit(1d)) / (col("n_raw") + col("v"))))
          .cast("decimal(18,9)").as("lr"))
    toks.join(broadcast(ratios), Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        (sum(col("lr")).cast("double") / count(lit(1))).as("raw"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("raw"), 4).as("dsir_weight"),
        (round(col("raw"), 4) > 0d).cast("int").as("selected"))
  }

  /** Vocabulary-coverage audit: fix the tokenizer vocabulary at the corpus'
    * `vocabSize` most frequent tokens (ties to the lexically smaller token —
    * deterministic) and report each document's out-of-vocabulary rate — the
    * number that decides whether a vocabulary is big enough before the
    * (expensive) tokenizer build bakes it in.
    *
    * Scale shape: token frequencies are one map-side-combined shuffle on the
    * token (the same key space the BPE miner uses); the top-N compiles to
    * `TakeOrderedAndProject` (per-partition heaps, no global sort); the
    * |vocab|-row table then BROADCASTS onto one exploded corpus pass whose
    * per-doc rollup collapses map-side (a document's tokens are co-located
    * after explode).
    * Output: (doc_id, n_tok, n_oov, oov_rate).
    */
  def vocabCoverage(docs: DataFrame, vocabSize: Int = 50): DataFrame = {
    val tok = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
    val vocab = tok.groupBy(col("t")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("t")).limit(vocabSize)
      .select(col("t"), lit(1L).as("iv"))
    tok.join(broadcast(vocab), Seq("t"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"),
        sum(when(col("iv").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        round((col("n_oov") * lit(1.0) / col("n_tok")).cast("decimal(28,10)"), 4)
          .cast("double"))
  }

  /** Per-source curation report: the dashboard rollup a corpus owner reads
    * before deciding which crawl sources to keep — per source, document and
    * token volume, language spread, exact-duplicate involvement, and the
    * quality-gate failure rate.
    *
    * Scale shape: the gate and the (n_tok, digest) signals evaluate in ONE
    * codegen projection over the scan (the gate's `retainCols` carries
    * `source`/`lang`/`text` through, so there is NO self-join of the corpus
    * against itself); duplicate marking is one shuffle on the 128-bit digest
    * (the [[Dedup.exactDedup]] key); the final rollup is a |sources|-row
    * hash aggregation — map-side combined, broadcast-join-free.
    * Output: (source, n_docs, n_tokens, n_langs, dup_docs, gate_fail,
    * dup_rate, pass_rate).
    */
  def sourceReport(docs: DataFrame, minTokens: Int = 20, maxTokens: Int = 2000,
                   maxStopRatio: Double = 0.5, minQuality: Double = 0.2,
                   maxDupFrac: Double = 0.8): DataFrame = {
    val b = qualityGate(docs, minTokens, maxTokens, maxStopRatio, minQuality,
        maxDupFrac, retainCols = Seq("source", "lang", "text"))
      .select(col("doc_id"), col("source"), col("lang"), col("keep"),
        size(split(col("text"), " ")).cast("long").as("n_tok"),
        md5(col("text")).as("fp"))
    val dupFps = b.groupBy(col("fp")).agg(count(lit(1)).as("nc"))
      .filter(col("nc") >= 2).select(col("fp"), lit(1L).as("isdup"))
    b.join(dupFps, Seq("fp"), "left")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        countDistinct(col("lang")).as("n_langs"),
        sum(coalesce(col("isdup"), lit(0L))).as("dup_docs"),
        sum(when(col("keep") === 0, 1L).otherwise(0L)).as("gate_fail"))
      .withColumn("dup_rate",
        round((col("dup_docs") * lit(1.0) / col("n_docs")).cast("decimal(28,10)"), 4)
          .cast("double"))
      .withColumn("pass_rate",
        round(((col("n_docs") - col("gate_fail")) * lit(1.0) / col("n_docs"))
          .cast("decimal(28,10)"), 4).cast("double"))
  }

  /** Character-trigram cosine language classifier (the real n-gram heuristic;
    * profiles are tiny fixtures here, a config file in deployment). Pure
    * Scala — used for single-string classification and unit-tested against
    * genuine sample sentences; the distributed path uses `langId`'s marker
    * heuristic, which is codegen-able.
    */
  def classifyTrigram(text: String): String = {
    val profiles = Map(
      "en" -> Seq("the", "he ", " th", "ing", "and", " an", "ed ", " of"),
      "de" -> Seq("er ", "en ", "der", "ein", "ich", "sch", " de", "die"),
      "es" -> Seq(" de", "de ", "os ", "la ", " la", "el ", "ión", "que"),
      "fr" -> Seq(" de", "es ", "le ", "de ", "ent", " le", "la ", "une"))
    val t = text.toLowerCase
    val grams = t.sliding(3).toSeq.groupBy(identity).view.mapValues(_.size).toMap
    val scored = profiles.toSeq.sortBy(_._1).map { case (lang, top) =>
      (top.map(g => grams.getOrElse(g, 0)).sum, lang)
    }
    val (bestScore, bestLang) = scored.maxBy { case (s, l) => (s, l) }
    if (bestScore > 0) bestLang else "und"
  }

  /** RAG chunk manifest: fixed-size overlapping token windows — the
    * retrieval-ingestion op that turns a corpus into embeddable chunks.
    *
    * Chunk starts step by `chunkToks - overlap`; a start is emitted only
    * while it contributes at least one token beyond the previous chunk's
    * overlap region (`start <= n - overlap - 1`), so a short tail is never a
    * fully-redundant sub-window of its predecessor. The last chunk may be
    * shorter than `chunkToks`. Each chunk carries a content digest (md5 of
    * the re-joined token slice) so downstream chunk-level dedup and
    * embedding caches key on content, not position.
    *
    * Scale shape: one narrow projection + explode per document — no shuffle,
    * no join; output size is ~n/(chunkToks-overlap) rows per doc. The digest
    * makes the manifest self-contained: re-chunking a grown corpus never
    * invalidates unchanged chunks.
    */
  def ragChunks(docs: DataFrame, chunkToks: Int = 64, overlap: Int = 16): DataFrame = {
    require(overlap >= 0 && overlap < chunkToks, s"bad chunk shape $chunkToks/$overlap")
    val stride = chunkToks - overlap
    val toks = tokens
    val n = size(toks)
    val starts = sequence(lit(0), greatest(n - lit(overlap + 1), lit(0)), lit(stride))
    docs.select(col("doc_id"), toks.as("w"), n.as("n"),
        posexplode(starts).as(Seq("chunk_idx", "s")))
      .select(col("doc_id"), col("chunk_idx"),
        col("s").cast("long").as("start_tok"),
        least(lit(chunkToks), col("n") - col("s")).cast("long").as("n_chunk_toks"),
        md5(concat_ws(" ", slice(col("w"), col("s") + lit(1), lit(chunkToks)))
          .cast("binary")).as("chunk_digest"))
  }

  /** Cross-document chunk-level dedup: which fixed-grid chunks appear
    * verbatim in MORE THAN ONE document — sub-document reuse (boilerplate,
    * syndicated passages, license headers) that document-level dedup cannot
    * see because the surrounding text differs. The ExactSubstr result (Lee
    * et al. 2022) at chunk granularity: cheap enough to run on every crawl,
    * with `llm_dup_spans` as the stride-1 escalation.
    *
    * Scale shape: the chunk projection feeds ONE hash aggregation on the
    * digest (map-side combinable); only digests with `n_docs > 1` survive,
    * so output is the duplicated slice, not the corpus. The canonical doc
    * (min doc_id) and spread (max - min) make each row auditable.
    */
  def chunkDedup(docs: DataFrame, chunkToks: Int = 64,
                 overlap: Int = 16): DataFrame =
    ragChunks(docs, chunkToks, overlap)
      .groupBy(col("chunk_digest"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).cast("long").as("n_occurrences"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .filter(col("n_docs") > 1)

  /** Corpus-frequency boilerplate SCRUB — the rewrite step [[chunkDedup]]
    * only detects: drop from every document each fixed-grid chunk whose
    * digest appears in MORE THAN `maxDocs` distinct documents (license
    * headers, navigation text, syndicated passages), and reassemble the
    * surviving chunks in order. The CCNet/RefinedWeb "remove lines seen
    * too often across the corpus" filter, at token-grid granularity
    * (this corpus has no line structure). Unlike a quality FILTER, the
    * output keeps every doc_id — a fully-boilerplate document survives as
    * an empty string with `n_chunks_kept = 0`, so the scrub composes with
    * downstream length gates instead of silently changing corpus
    * membership.
    *
    * Scale shape: the grid projection is shuffle-free per doc; the hot-
    * digest dictionary is ONE map-combinable hash aggregation, kept only
    * above the threshold (boilerplate dictionaries are tiny relative to
    * the corpus — CCNet's duplicated-line table is <1% of shard bytes), so
    * it broadcasts back onto the chunk stream as a hot-flag — no
    * corpus-sized shuffle for the scrub itself. Reassembly groups each
    * doc's flagged chunks once: ONE corpus shuffle total, bounded
    * document-sized state. Chunks must be NON-OVERLAPPING
    * (stride = chunkToks) or reassembly would duplicate overlap regions —
    * hence the grid here rather than [[ragChunks]]'s overlapped windows.
    */
  def boilerplateScrub(docs: DataFrame, chunkToks: Int = 64,
                       maxDocs: Int = 2): DataFrame = {
    val chunks = gridChunks(docs, chunkToks)
    val hot = chunks.groupBy(col("chunk_digest"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") > maxDocs)
      .select(col("chunk_digest"))
    scrubAgainstHotSet(chunks, hot, hotBytes = None)
  }

  /** The scrub's non-overlapping chunk grid: (doc_id, chunk_idx,
    * chunk_text, chunk_digest), one row per `chunkToks`-token window.
    * Shared by the one-shot [[boilerplateScrub]], the dictionary builder
    * ([[boilerplateDictRows]]), and the incremental scrub
    * ([[scrubWithDict]]).
    */
  private[graft] def gridChunks(docs: DataFrame, chunkToks: Int): DataFrame = {
    require(chunkToks > 0, s"bad chunk size $chunkToks")
    val toks = tokens
    val n = size(toks)
    val starts = sequence(lit(0), greatest(n - 1, lit(0)), lit(chunkToks))
    docs.select(col("doc_id"), toks.as("w"),
        posexplode(starts).as(Seq("chunk_idx", "s")))
      .select(col("doc_id"), col("chunk_idx"),
        concat_ws(" ", slice(col("w"), col("s") + lit(1), lit(chunkToks)))
          .as("chunk_text"))
      .withColumn("chunk_digest", md5(col("chunk_text").cast("binary")))
  }

  /** Conservative bytes-per-row for a broadcast hot-set estimate: a
    * 32-char md5 hex digest plus UnsafeRow/hash-relation overhead. */
  private val HotRowBytes = 64L

  /** Scrub a chunk grid against a given hot-digest set (one
    * `chunk_digest` column). Flag-then-rebuild in ONE corpus shuffle: a
    * left_anti + re-join of the rebuilt frame onto docs would shuffle the
    * corpus twice and lose fully-scrubbed documents; flagging keeps every
    * doc's chunk rows in the single groupBy (each doc has >= 1 chunk, even
    * empty text).
    *
    * Broadcast guard (r14 gap #2): the hot set broadcasts only while its
    * size fits the session threshold. `hotBytes` is the caller's KNOWN
    * on-disk bound when the hot set comes from a persisted dictionary
    * (job-free); with no bound the hot set is persisted once, its row
    * count measured (the digest aggregation runs exactly once — the join
    * reuses the persisted data, so the guard costs a count over cached
    * rows, not a second corpus pass), and a highly templated corpus whose
    * dictionary outgrows the threshold degrades to a shuffle join instead
    * of an OOM'd broadcast build. The persist lives for the one-shot
    * campaign job's lifetime (freed with the session / by the context
    * cleaner); the per-trigger streaming path always passes a bound and
    * never persists.
    */
  private def scrubAgainstHotSet(chunks: DataFrame, hot: DataFrame,
                                 hotBytes: Option[Long]): DataFrame = {
    val thr = chunks.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    val hotFlag = hot.select(col("chunk_digest"), lit(true).as("is_hot"))
    val sized = hotBytes match {
      case Some(b) => Dedup.maybeBroadcast(hotFlag, b)
      case None if thr <= 0 => hotFlag
      case None =>
        hotFlag.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        Dedup.maybeBroadcast(hotFlag, hotFlag.count() * HotRowBytes)
    }
    val flagged = chunks.join(sized, Seq("chunk_digest"), "left")
      .withColumn("is_hot", coalesce(col("is_hot"), lit(false)))
    flagged.groupBy(col("doc_id"))
      .agg(
        array_join(transform(filter(
          array_sort(collect_list(struct(col("chunk_idx"), col("chunk_text"),
            col("is_hot")))),
          x => !x("is_hot")), x => x("chunk_text")), " ").as("clean_text"),
        sum(when(col("is_hot"), 0L).otherwise(1L)).as("n_chunks_kept"),
        sum(when(col("is_hot"), 1L).otherwise(0L)).as("n_chunks_dropped"))
  }

  /** One batch's contribution to the PERSISTED boilerplate dictionary:
    * per-digest distinct-doc partial counts, to be appended to the
    * dictionary directory (`Dedup.appendToLshIndex` — the same bounded
    * append + coalesce-compaction + crash-healing swap lifecycle the LSH
    * index uses; coalesce-only compaction keeps partial rows, which is
    * correct because [[readBoilerplateDict]] re-aggregates on read).
    * Partials from different batches sum to the true cumulative distinct
    * count PROVIDED each doc_id arrives in exactly one appended batch —
    * the same exactly-once contract the MOR snapshot's batch-id ledger
    * enforces for events; replaying a batch into the dictionary
    * double-counts it.
    */
  def boilerplateDictRows(docs: DataFrame, chunkToks: Int = 64): DataFrame =
    boilerplateDictRowsFromChunks(gridChunks(docs, chunkToks))

  /** [[boilerplateDictRows]] over an ALREADY-computed chunk grid — the
    * incremental/streaming batch lifecycles feed the same grid to both the
    * dictionary append and the self-scrub; sharing one materialized grid
    * halves the per-batch tokenize+digest work (r15, guide §1.2: don't
    * compute things twice).
    */
  private[graft] def boilerplateDictRowsFromChunks(chunks: DataFrame): DataFrame =
    chunks
      .groupBy(col("chunk_digest"))
      .agg(countDistinct(col("doc_id")).cast("long").as("n_docs"))

  /** Append one batch's partial counts to the persisted dictionary —
    * delegates to the LSH index's maintenance (bounded append, coalesce
    * compaction past `maxFiles`, crash-healing rename dance): the
    * dictionary is just another small parquet side-index with the same
    * lifecycle needs, and the self-heal path is already crash-tested
    * there.
    */
  def appendToBoilerplateDict(dictDir: String, dictRows: DataFrame,
                              maxFiles: Int = 64): Unit =
    Dedup.appendToLshIndex(dictDir, dictRows, maxFiles)

  /** [[appendToBoilerplateDict]] with batch-id replay protection — the
    * form a `foreachBatch` caller MUST use (at-least-once delivery: a
    * replayed micro-batch through the raw append double-counts every
    * digest partial, and an over-counted dictionary over-scrubs documents;
    * the contract the plain append's doc states is ENFORCED here).
    * Delegates to [[Dedup.appendToLshIndexOnce]] /
    * [[graft.streaming.SideIndexLedger]]; a committed `batchId` is a
    * metadata-only no-op. Returns true iff this call published.
    */
  def appendToBoilerplateDictOnce(dictDir: String, dictRows: DataFrame,
                                  batchId: Long, maxFiles: Int = 64): Boolean =
    Dedup.appendToLshIndexOnce(dictDir, dictRows, batchId, maxFiles)

  /** The dictionary's current hot set: re-aggregate the appended partials
    * (one map-combinable pass over the dictionary — digest-distinct rows,
    * far smaller than the corpus) and keep digests above `maxDocs`. Reads
    * through [[Dedup.readLshIndex]] for the crashed-compaction self-heal.
    */
  def readBoilerplateDict(spark: org.apache.spark.sql.SparkSession,
                          dictDir: String, maxDocs: Int): DataFrame =
    Dedup.readLshIndex(spark, dictDir)
      .groupBy(col("chunk_digest"))
      .agg(sum(col("n_docs")).as("nd"))
      .filter(col("nd") > maxDocs)
      .select(col("chunk_digest"))

  /** INCREMENTAL scrub: clean one batch against the persisted dictionary
    * (which must already include the batch's own partials — append first,
    * then scrub, so a chunk that crosses the threshold WITHIN a batch is
    * scrubbed from it, matching the one-shot [[boilerplateScrub]] on the
    * union of all batches so far for chunks whose history is
    * single-batch). A growing corpus pays one grid pass + one bounded
    * dictionary append per batch — never a recount of history.
    */
  def scrubWithDict(batch: DataFrame, spark: org.apache.spark.sql.SparkSession,
                    dictDir: String, chunkToks: Int = 64,
                    maxDocs: Int = 2): DataFrame =
    scrubChunksWithDict(gridChunks(batch, chunkToks), spark, dictDir, maxDocs)

  /** [[scrubWithDict]] over an ALREADY-computed chunk grid (see
    * [[boilerplateDictRowsFromChunks]] — the batch lifecycles share one
    * grid between the dictionary append and the self-scrub).
    */
  private[graft] def scrubChunksWithDict(chunks: DataFrame,
                                         spark: org.apache.spark.sql.SparkSession,
                                         dictDir: String,
                                         maxDocs: Int = 2): DataFrame =
    // the dictionary's on-disk bytes bound the hot set from above (hot ⊆
    // the dictionary's digests) — a job-free broadcast guard, no persist
    // in the per-trigger path
    scrubAgainstHotSet(chunks,
      readBoilerplateDict(spark, dictDir, maxDocs),
      hotBytes = Some(Dedup.dirBytes(spark, dictDir)))
}
