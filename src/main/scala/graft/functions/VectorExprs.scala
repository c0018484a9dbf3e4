package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd cosine similarity over two `array<double>` columns.
  *
  * Why an Expression and not `aggregate(zip_with(...))`: Catalyst's
  * higher-order functions evaluate a lambda interpreter per element — they
  * are excluded from whole-stage codegen, so every cosine in the ANN/dedup
  * hot paths pays closure dispatch per dimension. This expression emits a
  * tight Java loop via `doGenCode` (one pass: dot product and both norms),
  * participates in whole-stage codegen, and keeps the EXACT summation order
  * of the sequential fold it replaces — `((0+x₀y₀)+x₁y₁)+…` — so results are
  * bit-identical to the HOF formulation and to the DuckDB oracle
  * (`list_dot_product` is the same left-to-right fold).
  *
  * Contract: equal-length arrays with non-null elements (embedding vectors).
  * On length mismatch the result is NULL — same as the `zip_with` fold it
  * replaced, so a truncated or corrupt embedding fails threshold filters
  * and sorts last in top-k windows instead of ranking on a prefix
  * similarity that would silently admit garbage vectors.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects (array<double>, array<double>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0d
    var na = 0d
    var nb = 0d
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0;
         |  double $na = 0.0;
         |  double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xi = $a.getDouble($i);
         |    double $yi = $b.getDouble($i);
         |    $dot += $xi * $yi;
         |    $na += $xi * $xi;
         |    $nb += $yi * $yi;
         |  }
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** Native codegen'd Euclidean distance over two `array<double>` columns —
  * the PQ hot loop (codebook assignment and ADC ranking both evaluate it
  * corpus × codebook times). Same rationale as [[CosineSim]]: the
  * `sqrt(aggregate(zip_with(...)))` formulation evaluates a lambda
  * interpreter per element outside whole-stage codegen; this emits one
  * fused Java loop and keeps the EXACT sequential summation order
  * `((0+d₀²)+d₁²)+…` followed by one sqrt, so results are bit-identical to
  * the HOF fold and to DuckDB's `list_distance`. NULL on length mismatch
  * (corrupt vectors fail filters instead of ranking on a prefix).
  */
case class L2Dist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"l2_dist expects (array<double>, array<double>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "l2_dist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var s = 0d
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      s += d * d
      i += 1
    }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = $a.getDouble($i) - $b.getDouble($i);
         |    $s += $d * $d;
         |  }
         |  ${ev.value} = java.lang.Math.sqrt($s);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): L2Dist =
    copy(left = newLeft, right = newRight)
}

/** Exact distinct word-n-gram count over a token array — the inner loop of
  * the repetition/quality-gate text filters.
  *
  * The Column formulation (`array_distinct(transform(sequence(...), slice +
  * concat_ws))`) materializes every gram as a fresh array + string per row
  * and then deduplicates the array — all outside whole-stage codegen because
  * of the lambda. This expression hashes byte-level gram concatenations into
  * one set per row (`UTF8String` equality == string equality, so the count
  * is EXACTLY `len(list_distinct(...))` in the oracle), inside codegen via a
  * static helper call. Returns 0 for docs shorter than n tokens.
  */
case class DistinctNGrams(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"distinct_ngrams expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "distinct_ngrams"

  override def nullSafeEval(input: Any): Any =
    DistinctNGrams.count(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DistinctNGrams.count($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): DistinctNGrams =
    copy(child = newChild)
}

object DistinctNGrams {
  private val Space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  /** Static so generated code can call it directly. */
  def count(arr: ArrayData, n: Int): Int = {
    val m = arr.numElements() - n + 1
    if (m <= 0) 0
    else {
      val set = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](m * 2)
      var i = 0
      while (i < m) {
        val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
        var j = 0
        while (j < n) {
          parts(j) = arr.getUTF8String(i + j)
          j += 1
        }
        set.add(org.apache.spark.unsafe.types.UTF8String.concatWs(Space, parts: _*))
        i += 1
      }
      set.size()
    }
  }
}

/** Bounded "latest k" aggregate: the k LARGEST long values per group,
  * emitted ascending — the ring-buffer primitive behind the last-21-event
  * intervals (reference `modules/intervals_between_events.py:23–32` keeps
  * exactly the last 21 timestamps per record).
  *
  * Why not `slice(sort_array(collect_list(ts)), -k, k)`: `collect_list`
  * accumulates EVERY row of the group before the slice throws all but k
  * away — per-group state is O(events-per-entity) on both the map and
  * reduce side, which is exactly the unbounded-state shape that OOMs on a
  * hot entity at corpus scale. This aggregate's buffer is a k-element
  * min-heap: O(k) memory per group everywhere, partial aggregation merges
  * two heaps by keeping the k largest, and the result is the identical
  * multiset (duplicates preserved) the sort+slice formulation produces.
  */
case class LatestK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate
    .TypedImperativeAggregate[java.util.PriorityQueue[java.lang.Long]] {

  require(k > 0, s"latest_k: k must be positive, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "latest_k"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"latest_k expects a bigint column, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): java.util.PriorityQueue[java.lang.Long] =
    new java.util.PriorityQueue[java.lang.Long](k + 1)

  override def update(heap: java.util.PriorityQueue[java.lang.Long],
                      input: org.apache.spark.sql.catalyst.InternalRow)
      : java.util.PriorityQueue[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val l = v.asInstanceOf[Long]
      // min-heap of the k largest: only contend when the candidate beats
      // the current minimum (O(1) reject for the common below-window case)
      if (heap.size() < k) heap.add(l)
      else if (l > heap.peek()) { heap.poll(); heap.add(l) }
    }
    heap
  }

  override def merge(a: java.util.PriorityQueue[java.lang.Long],
                     b: java.util.PriorityQueue[java.lang.Long])
      : java.util.PriorityQueue[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) {
      val l = it.next().longValue()
      if (a.size() < k) a.add(l)
      else if (l > a.peek()) { a.poll(); a.add(l) }
    }
    a
  }

  override def eval(heap: java.util.PriorityQueue[java.lang.Long]): Any = {
    val out = new Array[Long](heap.size())
    var i = 0
    val it = heap.iterator()
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    java.util.Arrays.sort(out)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def serialize(heap: java.util.PriorityQueue[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * heap.size())
    val it = heap.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[java.lang.Long] = {
    val heap = createAggregationBuffer()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 8) heap.add(bb.getLong())
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LatestK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LatestK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): LatestK =
    copy(child = newChildren.head)
}

/** Element-wise vector sum aggregate over an `array<double>` column —
  * `vec_sum(embedding)` returns one array whose element i is the double sum
  * of element i across the group's rows, accumulated partition-locally in
  * row-scan order and merged per partial (the same order structure as a
  * per-(group, pos) `sum(double)` hash aggregate, so results agree with the
  * explode shape to the usual partial-merge-order ulp class).
  *
  * Why: the centroid pass (`Ann.centroids`) previously posexploded the
  * corpus |dims|-ways and aggregated on (cluster, pos), then REGROUPED on
  * cluster to rebuild the array — two exchanges and a 64× row fan through
  * the hash aggregate for what is one running array per group. This
  * aggregate keeps a single |dims|-double buffer per group (bounded state,
  * like [[LatestK]]), turns the centroid pass into ONE map-side-combined
  * exchange, and removes the explode entirely (r16, guide §2.4; VERDICT r15
  * item 7 — prototyped against the 6-dp-rounded oracle at sf0.001/sf0.01
  * before shipping).
  *
  * Contract: dense, equal-length, non-null-element arrays (embedding
  * vectors — the same contract `cosine_sim`/`l2_dist` already assume); a
  * length mismatch fails fast rather than silently truncating.
  */
case class VecSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate
    .TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vec_sum"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_sum expects array<double>, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buf: Array[Double],
                      input: org.apache.spark.sql.catalyst.InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (buf.isEmpty) {
      val fresh = new Array[Double](n)
      var i = 0
      while (i < n) { fresh(i) = arr.getDouble(i); i += 1 }
      fresh
    } else {
      require(buf.length == n,
        s"vec_sum: vector length mismatch (${buf.length} vs $n)")
      var i = 0
      while (i < n) { buf(i) += arr.getDouble(i); i += 1 }
      buf
    }
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    if (b.isEmpty) return a
    if (a.isEmpty) return b
    require(a.length == b.length,
      s"vec_sum: partial length mismatch (${a.length} vs ${b.length})")
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Double]): Any =
    if (buf.isEmpty) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putDouble(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Double](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getDouble(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): VecSum =
    copy(child = newChildren.head)
}

/** All stride-1 n-token span digests of a token array, as one fused
  * codegen-able call: `span_digests(w, n)` returns `array<string>` of the
  * md5 hex of each n-token window joined with spaces — byte-identical to
  * `transform(sequence(...), i -> md5(concat_ws(' ', slice(w, i+1, n))))`,
  * but the HOF pipeline evaluates INTERPRETED (HigherOrderFunction has no
  * doGenCode) while this stays inside whole-stage codegen and reuses one
  * MessageDigest per row batch. Used by the duplicated-span scan
  * (`Dedup.dupSpanStats`), where span formation runs over every token of
  * the corpus.
  */
case class SpanDigests(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"span_digests expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "span_digests"

  override def nullSafeEval(input: Any): Any =
    SpanDigests.digests(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SpanDigests.digests($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): SpanDigests =
    copy(child = newChild)
}

object SpanDigests {
  private val Space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
  private val HexDigits = "0123456789abcdef".toCharArray

  /** Static so generated code can call it directly. */
  def digests(arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements() - n + 1
    if (m <= 0) new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Any](0))
    else {
      val md = java.security.MessageDigest.getInstance("MD5")
      val out = new Array[Any](m)
      var i = 0
      while (i < m) {
        val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
        var j = 0
        while (j < n) {
          parts(j) = arr.getUTF8String(i + j)
          j += 1
        }
        val bytes = org.apache.spark.unsafe.types.UTF8String
          .concatWs(Space, parts: _*).getBytes
        md.reset()
        val dig = md.digest(bytes)
        val hex = new Array[Char](32)
        var k = 0
        while (k < 16) {
          hex(2 * k) = HexDigits((dig(k) >> 4) & 0xf)
          hex(2 * k + 1) = HexDigits(dig(k) & 0xf)
          k += 1
        }
        out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(new String(hex))
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }
}

/** Rabin–Karp chunk fingerprints as one fused codegen call:
  * `chunk_fps(tokens, w, stride)` returns `array<long>` with the polynomial
  * hash `((a·131 + h) mod 2³¹−1)` of each `w`-token window every `stride`
  * tokens, where `h(tok)` is the first-8-hex-digits value of `md5(tok)` —
  * bit-identical to the `transform(…, aggregate(slice(…)))` HOF pipeline in
  * `Dedup.chunkFingerprints`, which evaluates interpreted per element. One
  * md5 per token per document; window `k`'s offset is `k·stride`
  * (recovered via `posexplode`).
  */
case class ChunkFps(child: Expression, w: Int, stride: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"chunk_fps expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "chunk_fps"

  override def nullSafeEval(input: Any): Any =
    ChunkFps.fps(input.asInstanceOf[ArrayData], w, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ChunkFps.fps($c, $w, $stride)")

  override protected def withNewChildInternal(newChild: Expression): ChunkFps =
    copy(child = newChild)
}

object ChunkFps {
  private val P = 2147483647L // 2^31 - 1, Dedup.MinhashPrime

  /** Static so generated code can call it directly. */
  def fps(arr: ArrayData, w: Int, stride: Int): ArrayData = {
    val nTok = arr.numElements()
    if (nTok < w) new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Long](0))
    else {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hs = new Array[Long](nTok)
      var i = 0
      while (i < nTok) {
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        // first 8 hex digits of the md5 == first 4 digest bytes, unsigned
        hs(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        i += 1
      }
      val m = (nTok - w) / stride + 1
      val out = new Array[Long](m)
      var k = 0
      while (k < m) {
        val off = k * stride
        var a = 0L
        var j = 0
        while (j < w) {
          a = (a * 131L + hs(off + j)) % P
          j += 1
        }
        out(k) = a
        k += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }
}

/** All stride-1 n-token spans of a token array as plain strings —
  * `ngram_spans(w, n)` is the codegen form of
  * `transform(sequence(0, size(w)-n), i -> concat_ws(' ', slice(w, i+1, n)))`
  * (which evaluates interpreted). Feeds the shingle table build behind the
  * whole near-dedup/minhash/contamination family; output strings are
  * byte-identical so every downstream join and oracle is unchanged.
  */
case class NGramSpans(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_spans expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ngram_spans"

  override def nullSafeEval(input: Any): Any =
    NGramSpans.spans(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NGramSpans.spans($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): NGramSpans =
    copy(child = newChild)
}

object NGramSpans {
  private val Space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  /** Static so generated code can call it directly. */
  def spans(arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements() - n + 1
    if (m <= 0) new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Any](0))
    else {
      val out = new Array[Any](m)
      var i = 0
      while (i < m) {
        val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
        var j = 0
        while (j < n) {
          parts(j) = arr.getUTF8String(i + j)
          j += 1
        }
        out(i) = org.apache.spark.unsafe.types.UTF8String.concatWs(Space, parts: _*)
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }
}
