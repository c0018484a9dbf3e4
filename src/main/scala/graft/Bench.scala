package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark main: one JSON line `{"metric":"total",...}` for the driver.
  *
  * Measurement rules (VERDICT r1 #3): force FULL evaluation with a noop-format
  * write — a bare `.count()` lets Catalyst prune every aggregate not needed
  * for row counting — and run one untimed warmup pass over all queries first
  * so JVM/codegen/scan warmup doesn't land on whichever query runs first.
  * Queries run in sorted-name order so cross-round numbers are comparable.
  *
  * CALIBRATION ANCHORS (VERDICT r11 "What's wrong" #1): this box's
  * day-to-day speed drifts ~1.3×, which made raw cross-round wall-clock
  * uninterpretable. Every sweep therefore times two FIXED workloads whose
  * cost never changes across rounds — a pure-CPU hash reduction over
  * `spark.range` (no input data at all) and a fixed-IO scan that always
  * reads the SAME sf0.1 files regardless of the sweep's SF dir — once
  * before and once after the suite (in-sweep drift shows up as pre/post
  * disagreement). The detail file carries `anchors` plus
  * `queries_norm_cpu` (query seconds ÷ mean CPU-anchor seconds), so
  * round-over-round comparisons are stated in anchor units: a query is
  * only slower than last round if its ANCHOR-NORMALIZED time moved.
  */
object Bench {

  /** Pure-CPU anchor: a chained xxhash64 reduction over 2²⁹ generated rows.
    * No file IO, no shuffle (partial aggs collapse map-side), fully
    * codegen'd — its seconds measure this box's compute speed today and
    * nothing else.
    */
  def anchorCpu(spark: SparkSession): DataFrame = {
    // bit_xor, not sum: a sum of 2²⁹ hash values overflows long under ANSI
    val h = (0 until 8).foldLeft(col("id"))((c, i) => xxhash64(c, lit(i)))
    spark.range(0, 1L << 29, 1, 64).select(h.as("h"))
      .agg(expr("bit_xor(h)").as("x"))
  }

  /** Fixed-IO anchor: scan + decode the full-width sf0.1 lineitem from a
    * PINNED path (env-overridable, but never derived from the sweep's SF
    * dir — the whole point is a workload whose bytes are identical in
    * every sweep of every round).
    */
  def anchorIo(spark: SparkSession): DataFrame = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_ANCHOR_DIR", "/root/testdata/sf0.1")
    // 32 salted copies of the full-width lineitem scan (per-copy salt keeps
    // the plans distinct): ~64 scan tasks keep the 32-way executor busy for
    // a couple of waves, so the anchor measures the box's aggregate
    // scan+decode throughput, not one task's latency. Bytes are pinned —
    // the same file, every sweep, every round.
    val l = spark.read.parquet(s"$dir/lineitem.parquet")
    val wide = xxhash64(l.columns.map(col): _*)
    (0 until 32)
      .map(i => l.select(xxhash64(wide, lit(i)).as("h")).agg(expr("bit_xor(h)").as("x")))
      .reduce(_ unionByName _)
      .agg(expr("bit_xor(x)").as("x"))
  }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // The default 100-entry codegen class cache thrashes across a 60-query
      // suite: the warmup pass's compiled classes are evicted before the
      // timed pass, so wide-aggregate queries (64-column MinHash/SimHash)
      // pay multi-second Janino recompiles in the measurement. Size the
      // cache to the suite.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      // Single-file tables split by byte range: the default 128 MB split
      // leaves a 64 MB 100x-scale table on ONE core of 32. 8 MB keeps base-SF
      // plans identical (every sf0.1 file is smaller than 8 MB -> still one
      // split) while a scaled corpus fans out across the executor. The open
      // cost must scale WITH the split size (default 4 MB was tuned for
      // 128 MB bins): left at 4 MB, an 8 MB bin packs only TWO small files,
      // shattering every multi-file scratch store into tiny tasks — measured
      // as a broad 1.3–1.8x suite slowdown. 256 KB keeps the default's 32:1
      // bin:open-cost ratio.
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PART_BYTES", "8m"))
      .config("spark.sql.files.openCostInBytes",
        sys.env.getOrElse("SPARK_GRAFT_OPEN_COST_BYTES", "262144"))
      // pinned for WardenFilter's shared from_json (see Verify.scala)
      .config("spark.sql.json.enablePartialResults", "true")
      // native graft expressions (cosine_sim) via the declarative hook; the
      // operators also self-register imperatively on foreign sessions
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.kryo.registrator", "graft.GraftKryoRegistrator")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_ONLY=name1,name2 restricts the run (local iteration aid).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    def runOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        failed += name
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      (System.nanoTime() - t0) / 1e9
    }
    val anchors = Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)](
      "anchor_cpu" -> ((s, _) => anchorCpu(s)),
      "anchor_io" -> ((s, _) => anchorIo(s)))
    ordered.foreach { case (n, f) => runOne(n, f) } // warmup, untimed
    anchors.foreach { case (n, f) => runOne(n, f) } // anchor warmup, untimed
    failed.clear() // only the timed pass decides the reported error set
    // anchors bracket the suite: pre/post disagreement IS the in-sweep drift
    val anchorsPre = anchors.map { case (n, f) => System.gc(); n -> runOne(n, f) }
    // TIME-RESOLVED anchors (r13 post-mortem: the box drifted MID-RUN and a
    // mean anchor cannot correct drift that arrives partway through a
    // sorted-order sweep — it lands on whichever alphabetical tail runs
    // last). Re-time the pure-CPU anchor every `anchorEvery` queries and
    // normalize each query by its SEGMENT's anchor: a slowdown that hits
    // minutes 5–10 of the run divides out of exactly the queries it
    // distorted. Segment anchors are ADDITIVE — `queries_norm_cpu` keeps
    // its mean-anchor definition for cross-round comparability with r12.
    val anchorEvery = sys.env.getOrElse("SPARK_GRAFT_ANCHOR_EVERY", "20").toInt
    val segAnchors = scala.collection.mutable.ArrayBuffer[Double]()
    val segOf = scala.collection.mutable.LinkedHashMap[String, Int]()
    val results = ordered.zipWithIndex.map { case ((n, f), i) =>
      if (i % anchorEvery == 0) {
        System.gc()
        segAnchors += runOne("anchor_cpu", anchors.head._2)
      }
      segOf(n) = segAnchors.length - 1
      // park cross-query garbage (broadcast blocks, codegen classes, shuffle
      // buffers from the previous query) OUTSIDE the next timed region — a
      // full-suite run otherwise lands a multi-second GC pause on whichever
      // query happens to run when the heap fills, misattributing the cost
      System.gc()
      n -> runOne(n, f)
    }
    val anchorsPost = anchors.map { case (n, f) => System.gc(); n -> runOne(n, f) }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    // a FAILED anchor run returns its time-to-failure, which would silently
    // corrupt every anchor-normalized number — if anchor_cpu failed in the
    // timed pass, emit null for the mean and omit queries_norm_cpu entirely
    // so a broken anchor can't masquerade as a valid normalization baseline
    val anchorOk = !failed.contains("anchor_cpu")
    val cpuMean = (anchorsPre ++ anchorsPost).filter(_._1 == "anchor_cpu")
      .map(_._2).sum / 2d
    val anchorJson = (anchorsPre.map { case (k, v) => "\"" + k + "_pre\":" + v } ++
      anchorsPost.map { case (k, v) => "\"" + k + "_post\":" + v } ++
      Seq("\"anchor_cpu_mean\":" + (if (anchorOk) cpuMean.toString else "null")))
      .mkString("{", ",", "}")
    // stdout is captured tail-first downstream (last ~2000 chars survive), so
    // the headline value/errors go LAST on the line; the full per-query map
    // is also written to a file next to the run for durable inspection.
    // gc_between_queries: totals exclude cross-query GC pauses (System.gc()
    // before each timed region) — only compare against runs of this harness
    val line = s"""{"metric":"total","unit":"sec","sf":"$sfDir","gc_between_queries":true,"anchors":$anchorJson,"queries":$qs,"errors":$errs,"value":$total}"""
    println(line)
    // the detail file additionally carries the anchor-normalized map —
    // cross-round comparisons should be made on THESE numbers, not seconds
    val qsNormField =
      if (!anchorOk) ""
      else {
        val qsNorm = results.map { case (k, v) =>
          "\"" + k + "\":" + (math.round(v / cpuMean * 1000d) / 1000d) }
          .mkString("{", ",", "}")
        // segment-local normalization: divide by the nearest-in-time anchor
        // instead of the run mean, so mid-run box drift divides out of the
        // queries it actually hit
        val segArr = segAnchors.map(v => math.round(v * 1000d) / 1000d)
          .mkString("[", ",", "]")
        val qsNormLocal = results.map { case (k, v) =>
          val a = segAnchors(segOf(k))
          "\"" + k + "\":" + (math.round(v / math.max(a, 1e-9) * 1000d) / 1000d) }
          .mkString("{", ",", "}")
        s""""queries_norm_cpu":$qsNorm,"anchor_cpu_segments":$segArr,""" +
          s""""anchor_every":$anchorEvery,"queries_norm_cpu_local":$qsNormLocal,"""
      }
    val detail = s"""{"metric":"total","unit":"sec","sf":"$sfDir","gc_between_queries":true,"anchors":$anchorJson,"queries":$qs,$qsNormField"errors":$errs,"value":$total}"""
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_DETAIL.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), detail + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] detail write failed: $e") }
    // COMPACT final line (additions-only, VERDICT r15 #1): the full line
    // above is ~10 KB with 168 queries and cannot survive a ~2000-char
    // tail-first stdout capture — its opening brace is always cut off, so
    // downstream parses have come back null since r10. This second line
    // carries the headline contract fields (value/errors/sf) plus a pointer
    // to the detail file, is a few hundred bytes at any suite size, and is
    // printed LAST so a tail capture always ends with one complete,
    // parseable JSON object. The timed loop and the full line are untouched.
    println(s"""{"metric":"total","unit":"sec","sf":"$sfDir","n_queries":${results.size},"anchor_cpu_mean":${if (anchorOk) cpuMean.toString else "null"},"detail":"$out","errors":$errs,"value":$total}""")
    spark.stop()
  }
}
