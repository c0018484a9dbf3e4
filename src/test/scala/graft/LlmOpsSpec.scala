package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{Dedup, TextStats}

/** Unit coverage for llm-operator paths the oracle queries don't reach: the
  * inverted-index skew guard, the trigram classifier, and the snapshot's
  * shuffle budget.
  */
class LlmOpsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("maxShingleDf skew guard drops stop-shingles but keeps rare-shingle pairs") {
    import spark.implicits._
    // "a b c" appears in EVERY doc (a stop-shingle); docs 1/2 also share the
    // rare tail "x y z w".
    val docs = Seq(
      (1L, "a b c x y z w"),
      (2L, "a b c x y z w"),
      (3L, "a b c q r s t"),
      (4L, "a b c u v n m")
    ).toDF("doc_id", "text")
    // Without the cap: every pair is a candidate through "a b c".
    val all = Dedup.nearDupPairs(docs, n = 3, threshold = 0.1).collect()
    assert(all.length == 6) // all pairs share >= 1 shingle and pass 0.1
    // Cap df at 3: the universal shingle is dropped; only the rare-overlap
    // pair (1,2) survives - and its Jaccard is now computed over the pruned
    // shingle sets (identical sets => 1.0).
    val guarded = Dedup.nearDupPairs(docs, n = 3, threshold = 0.1, maxShingleDf = Some(3))
      .collect()
    assert(guarded.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    assert(guarded.head.getDouble(2) == 1.0)
  }

  test("trigram language classifier picks the profiled language") {
    assert(TextStats.classifyTrigram("the thing and the other thing") == "en")
    assert(TextStats.classifyTrigram("ich habe einen schönen deutschen Satz geschrieben") == "de")
    assert(TextStats.classifyTrigram("la casa de la señora que vive en el barrio") == "es")
    assert(TextStats.classifyTrigram("zzzz qqqq") == "und")
  }

  test("MinHash-LSH finds no false positives and recalls the exact pair set") {
    import org.apache.spark.sql.functions.col
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1))
    val exact = Dedup.nearDupPairs(docs, n = 3, threshold = 0.5)
      .select(col("d1"), col("d2")).collect().map(key).toSet
    val lsh = Dedup.minhashLsh(docs, n = 3, k = 64, rowsPerBand = 4, threshold = 0.5)
      .select(col("d1"), col("d2")).collect().map(key).toSet
    // exact-verification step => no false positives, ever
    assert(lsh.subsetOf(exact), s"false positives: ${lsh -- exact}")
    // banded signatures: P(candidate) ~ 1 for the true-duplicate band, so
    // recall on the fixture must be high (deterministic given the data)
    assert(exact.isEmpty || lsh.size.toDouble / exact.size >= 0.8,
      s"recall ${lsh.size}/${exact.size}")
  }

  test("sign-LSH cosine near-dup is a no-false-positive subset of brute force") {
    import org.apache.spark.sql.functions.col
    import graft.llm.Ann
    val emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val b = emb.as("a").join(emb.as("b"),
        col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", org.apache.spark.sql.functions.round(
        Ann.cosine(col("a.embedding").cast("array<double>"),
          col("b.embedding").cast("array<double>")), 6))
      .filter(col("cos") >= 0.35)
      .select(col("a.vec_id"), col("b.vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Ann.cosineNearDupPairs(emb, threshold = 0.35)
      .select(col("d1"), col("d2"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(b), s"false positives: ${lsh -- b}")
    assert(b.isEmpty || lsh.nonEmpty, "bucketing lost every true pair")
  }

  test("snapshot stays within its 2-shuffle budget") {
    // "today" deliberately differs from the data's real max date: SparkEntry
    // persists its snapshot, and an identical plan here would be substituted
    // by the cached InMemoryRelation (whose printed child plan inflates the
    // Exchange count)
    val snap = graft.derive.Derive.snapshot(
      graft.core.Tables.events(spark, "/root/testdata/sf0.001"), "2024-01-29")
    val exchanges = "Exchange".r
      .findAllIn(snap.queryExecution.executedPlan.toString).size
    assert(exchanges <= 2, s"snapshot plan grew to $exchanges exchanges")
  }
}
