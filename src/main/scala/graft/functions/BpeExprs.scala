package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The merge-rank table a [[BpeTokenCount]] expression encodes against,
  * shipped to executors ONCE as a Spark `Broadcast` (the expression holds
  * only the broadcast handle, so the plan — and the generated code — is
  * vocab-size-independent: a 50 000-rule production tokenizer and a 40-rule
  * fixture produce the identical plan shape).
  *
  * `flat(i)` is `x + " " + y` for the rank-`i` merge; the lookup map is
  * rebuilt lazily per executor after deserialization.
  */
case class BpeRanks(flat: Array[String]) {
  @transient lazy val map: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](flat.length * 2)
    var i = 0
    while (i < flat.length) {
      if (!m.containsKey(flat(i))) m.put(flat(i), Integer.valueOf(i))
      i += 1
    }
    m
  }
}

object BpeRanks {
  def fromPairs(merges: Seq[(String, String)]): BpeRanks =
    BpeRanks(merges.map { case (x, y) => x + " " + y }.toArray)
}

/** Driver-side handle registry so the SQL function surface
  * (`bpe_token_count(text, table_id)`) can resolve a broadcast rank map at
  * plan-build time — function-registry builders only see expressions, and a
  * merge table does not belong in a literal (that would put the vocab back
  * in the plan). `register` is called once per broadcast table; the id is
  * what rides the query as a tiny int literal.
  */
object BpeBroadcasts {
  private val tables =
    new java.util.concurrent.ConcurrentHashMap[Int, Broadcast[BpeRanks]]()
  private val byContent =
    new java.util.concurrent.ConcurrentHashMap[(String, Seq[(String, String)]), Integer]()
  private val nextId = new java.util.concurrent.atomic.AtomicInteger(0)

  def register(bc: Broadcast[BpeRanks]): Int = {
    val id = nextId.getAndIncrement()
    tables.put(id, bc)
    id
  }

  /** Registered id for `merges`, broadcasting AT MOST ONCE per distinct
    * merge table per Spark application: repeated `Bpe.tokenCount` calls
    * against the same table (the common shape — one tokenizer artifact,
    * many encode jobs / micro-batches) reuse one broadcast instead of
    * accumulating an undestroyable block per call. Keyed by
    * (applicationId, table content) so a restarted context never resolves
    * to a dead broadcast from its predecessor.
    */
  def registerCached(spark: org.apache.spark.sql.SparkSession,
                     merges: Seq[(String, String)]): Int = {
    val app = spark.sparkContext.applicationId
    // One active SparkContext per JVM: any entry keyed under a DIFFERENT
    // applicationId belongs to a stopped context, whose broadcast blocks
    // died with it — drop those registrations (no destroy(): the context
    // that owned them is gone) so a session-restarting JVM doesn't
    // accumulate dead handles and `registeredCount` stays an honest
    // live-registration count.
    byContent.entrySet().removeIf(
      (e: java.util.Map.Entry[(String, Seq[(String, String)]), Integer]) =>
        if (e.getKey._1 != app) { tables.remove(e.getValue.intValue()); true }
        else false)
    byContent.computeIfAbsent(
      (app, merges),
      _ => Integer.valueOf(
        register(spark.sparkContext.broadcast(BpeRanks.fromPairs(merges))))
    ).intValue()
  }

  /** Drop `id` and DESTROY its broadcast (frees the executor-side blocks).
    * Any still-running plan holding the broadcast handle keeps its own
    * reference; only registry resolution and the content cache are cut.
    */
  def unregister(id: Int): Unit = {
    val bc = tables.remove(id)
    if (bc != null) {
      byContent.entrySet().removeIf(
        (e: java.util.Map.Entry[(String, Seq[(String, String)]), Integer]) =>
          e.getValue.intValue() == id)
      bc.destroy()
    }
  }

  /** Live registrations — spec hook for the no-growth invariant. */
  def registeredCount: Int = tables.size()

  def get(id: Int): Broadcast[BpeRanks] = {
    val bc = tables.get(id)
    require(bc != null, s"no broadcast BPE table registered under id $id")
    bc
  }
}

/** Native BPE encode as ONE codegen'd scalar: `bpe_token_count(text)` —
  * the post-encode token count of `text` under a broadcast merge-rank map.
  *
  * Algorithm: the textbook iterative encode real tokenizers use — per word,
  * repeatedly find the LOWEST-RANKED adjacent symbol pair present and merge
  * every occurrence of it left-to-right, until no adjacent pair is in the
  * table. For a well-formed learned merge table (each side is a base
  * character or the output of an earlier merge — true of every trained BPE
  * artifact) this is provably equal to applying the merges one-by-one in
  * rank order, each to fixpoint: a later merge only creates brand-new token
  * strings, so it can never re-create an earlier merge's pair. `BpeSpec`
  * pins that equivalence — including the self-pair (x == y over a run)
  * case a replace-chain formulation gets wrong.
  *
  * Why a native Expression and not a chain of `replace` columns (the shape
  * this replaced): one `replace` per merge makes plan size and per-row work
  * proportional to VOCAB size — a production 50k-merge table would compile
  * 100k nested string traversals per document. Here the work is
  * O(word_len · merges_applied) per word, lookups against a hash map, and
  * the table rides a broadcast instead of the plan, so the cost depends
  * only on the text, never the vocab. Stays inside whole-stage codegen
  * (static call, same pattern as [[SpanDigests]]).
  *
  * Word boundaries: words are maximal runs of non-space characters; merges
  * never cross them (same contract as the reference tokenizer's
  * pre-splitting). A 1-char word is 1 token; runs of spaces contribute 0.
  */
case class BpeTokenCount(child: Expression, ranks: Broadcast[BpeRanks])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_token_count expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_token_count"

  override def nullSafeEval(input: Any): Any =
    BpeTokenCount.count(input.asInstanceOf[UTF8String], ranks.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("bpeRanks", ranks,
        classOf[Broadcast[_]].getName)
      s"graft.functions.BpeTokenCount.count($c, " +
        s"(graft.functions.BpeRanks) $ref.value())"
    })

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

object BpeTokenCount {

  /** Static so generated code can call it directly. */
  def count(text: UTF8String, ranks: BpeRanks): Long = {
    val s = text.toString
    val map = ranks.map
    val n = s.length
    var total = 0L
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        if (i > start) total += wordTokens(s, start, i, map)
        start = i + 1
      }
      i += 1
    }
    total
  }

  /** Encode one word in place over a symbol array; returns its token count.
    * Each outer round finds the best-ranked pair with one adjacent scan and
    * merges all its occurrences with one compaction pass — merging pair
    * (x,y) can only create pairs of HIGHER rank in a well-formed table, so
    * re-scanning after the pass preserves exact leftmost-iterative BPE
    * semantics (including x == y runs: "aaaaaa" + (a,a) -> aa aa aa).
    */
  private def wordTokens(s: String, from: Int, until: Int,
                         ranks: java.util.HashMap[String, Integer]): Int = {
    val len = until - from
    if (len <= 1) return len
    val syms = new Array[String](len)
    var i = 0
    while (i < len) {
      syms(i) = String.valueOf(s.charAt(from + i))
      i += 1
    }
    var m = len
    val key = new java.lang.StringBuilder(16)
    while (m > 1) {
      var best = Integer.MAX_VALUE
      var bx: String = null
      var by: String = null
      var j = 0
      while (j < m - 1) {
        key.setLength(0)
        key.append(syms(j)).append(' ').append(syms(j + 1))
        val r = ranks.get(key.toString)
        if (r != null && r.intValue() < best) {
          best = r.intValue()
          bx = syms(j)
          by = syms(j + 1)
        }
        j += 1
      }
      if (bx == null) return m
      val merged = bx + by
      var w = 0
      var r = 0
      while (r < m) {
        if (r < m - 1 && syms(r) == bx && syms(r + 1) == by) {
          syms(w) = merged
          r += 2
        } else {
          syms(w) = syms(r)
          r += 1
        }
        w += 1
      }
      m = w
    }
    m
  }
}
