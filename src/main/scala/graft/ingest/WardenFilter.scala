package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The Warden ingest filter (reference `NERDd/warden_receiver.py:209–401`)
  * compiled to Column predicates.
  *
  * Rule syntax (same as the reference config `etc/nerdd.yml` warden_filter):
  * {{{
  *   "<pattern> <op> <value> [AND|OR <pattern> <op> <value> ...] ; <action>"
  *   "; <action>"                      // default action (last entry)
  * }}}
  * where pattern is a JSONPath into the message (the leading `\$.` is
  * implied), op is `=` / `!=`, and action is `pass`, `drop`, or `sample N`.
  * AND and OR cannot be mixed within one rule (reference
  * `warden_receiver.py:250–257`).
  *
  * Evaluation semantics mirror `_evaluate_rule` (`:326–381`): `=` means "the
  * compared string is among the stringified JSONPath matches", `!=` means it
  * is not (so a missing attribute satisfies `!=`); the FIRST rule that
  * evaluates true decides via its action; no match ⇒ default action.
  * `sample N` is the reference's count-based 1-in-N sampler (`:192–206`,
  * every Nth matching message passes) made deterministic: occurrence index =
  * `row_number()` over the rule's matched rows ordered by `orderCol` — the
  * distributed restatement of "arrival order" that is reproducible across
  * runs and engines.
  *
  * Scale notes: pass/drop-only rule sets compile to a single codegen'd
  * filter projection (no shuffle). A `sample` action needs the per-rule
  * occurrence index, which is one window shuffle keyed on the matched rule
  * id — bounded by the number of rules, and only paid when a sample rule
  * exists.
  */
object WardenFilter {

  sealed trait Action
  case object Pass extends Action
  case object Drop extends Action
  final case class SampleN(n: Int) extends Action

  /** How `sample N` picks its 1-in-N.
    *
    *  - `Counter` is reference-faithful (`warden_receiver.py:192–206`: every
    *    Nth matching message, by arrival order) — it needs an occurrence
    *    index, i.e. one window shuffle partitioned by rule id, which
    *    serializes a high-volume sample rule through one partition.
    *  - `Hash` keeps rows where `hash(orderCol) % N == 0`: statistically
    *    1-in-N, deterministic, zero shuffle — the scale-safe variant for
    *    sample rules matching a large fraction of the stream. DOCUMENTED
    *    DIVERGENCE: it is not the exact-every-Nth sequence.
    */
  sealed trait SampleMode
  object SampleMode {
    case object Counter extends SampleMode
    case object Hash extends SampleMode
  }

  final case class Clause(path: String, op: String, value: String)
  final case class Rule(logic: String, clauses: Seq[Clause], action: Action)

  private def parseAction(s: String): Action = s.trim match {
    case "pass" => Pass
    case "drop" => Drop
    case a if a.startsWith("sample") =>
      SampleN(a.split(' ')(1).trim.toInt)
    case other => throw new IllegalArgumentException(s"unsupported action: $other")
  }

  private def parseClause(s: String): Clause = {
    // '!=' must be checked before '=' (reference comment, warden_receiver.py:211)
    if (s.contains("!=")) {
      val Array(p, v) = s.split("!=", 2)
      Clause(p.trim, "!=", v.trim)
    } else if (s.contains("=")) {
      val Array(p, v) = s.split("=", 2)
      Clause(p.trim, "=", v.trim)
    } else throw new IllegalArgumentException(s"clause without operator: $s")
  }

  /** Parse the rule list; a trailing "; action" entry sets the default
    * action (reference `warden_receiver.py:225–240`).
    */
  def parseRules(rules: Seq[String]): (Seq[Rule], Action) = {
    val (ruleLines, default) =
      if (rules.nonEmpty && rules.last.trim.startsWith(";"))
        (rules.init, parseAction(rules.last.trim.drop(1)))
      else (rules, Pass)
    val parsed = ruleLines.map { line =>
      val parts = line.split(";")
      require(parts.length == 2, s"exactly one action per rule: $line")
      val (cond, action) = (parts(0), parseAction(parts(1)))
      val hasAnd = cond.contains("AND")
      val hasOr = cond.contains("OR")
      require(!(hasAnd && hasOr), "logical operators AND and OR cannot be mixed")
      if (hasAnd) Rule("AND", cond.split("AND").map(parseClause).toSeq, action)
      else if (hasOr) Rule("OR", cond.split("OR").map(parseClause).toSeq, action)
      else Rule("AND", Seq(parseClause(cond)), action)
    }
    (parsed, default)
  }

  /** `=` is set-membership over ALL JSONPath matches (`_evaluate_rule`,
    * `warden_receiver.py:326–381`: `compared_value in pattern_values`);
    * `!=` its negation — so a missing attribute satisfies `!=`. Wildcard
    * paths extract to an array of stringified matches; scalar paths to one
    * value (a one-element match list).
    */
  private def clausePredicate(c: Clause, extracted: Map[String, Column]): Column = {
    val matched = extracted(c.path)
    val isIn =
      if (isWildcard(c.path)) coalesce(array_contains(matched, c.value), lit(false))
      else coalesce(matched === c.value, lit(false))
    c.op match {
      case "="  => isIn
      case "!=" => !isIn
    }
  }

  // ---- multi-match JSONPath extraction (`$.a[*].b[*]` patterns) ----

  private def isWildcard(path: String) = path.contains("[*]")

  private final case class Seg(name: String, wild: Boolean)
  private def parseSegs(path: String): Seq[Seg] = path.split('.').toSeq.map { s =>
    if (s.endsWith("[*]")) Seg(s.dropRight(3), wild = true) else Seg(s, wild = false)
  }

  /** Schema targeting exactly the pattern's spine — `a[*].b[*]` parses with
    * `STRUCT<a: ARRAY<STRUCT<b: ARRAY<STRING>>>>`; everything else in the
    * message is skipped by the Jackson parser. The schemas of ALL wildcard
    * paths in a rule set merge into one tree so the whole filter costs a
    * single focused parse, like the scalar projection.
    */
  private def matchSchema(segs: Seq[Seg]): org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    segs.foldRight(StringType: DataType) { (seg, inner) =>
      StructType(Seq(StructField(seg.name, if (seg.wild) ArrayType(inner) else inner)))
    }.asInstanceOf[StructType]
  }

  private def mergeSchemas(a: org.apache.spark.sql.types.StructType,
                           b: org.apache.spark.sql.types.StructType): org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    def mergeDt(x: DataType, y: DataType): DataType = (x, y) match {
      case (ArrayType(p, _), ArrayType(q, _)) => ArrayType(mergeDt(p, q))
      case (p: StructType, q: StructType)     => mergeSchemas(p, q)
      case _                                  => x
    }
    val bMap = b.fields.map(f => f.name -> f).toMap
    StructType(
      a.fields.map(f => bMap.get(f.name)
        .map(g => org.apache.spark.sql.types.StructField(f.name, mergeDt(f.dataType, g.dataType)))
        .getOrElse(f)) ++
        b.fields.filterNot(f => a.fieldNames.contains(f.name)))
  }

  /** True when the two extraction schemas can share one parse tree — i.e.
    * no node is an array-spine in one path and a scalar/struct in the other
    * (a pattern like `a.b = x` alongside `a.b[*].c = y`). Conflicting
    * scalar paths fall back to their own `get_json_object`.
    */
  private def canMerge(a: org.apache.spark.sql.types.DataType,
                       b: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    (a, b) match {
      case (ArrayType(p, _), ArrayType(q, _)) => canMerge(p, q)
      case (p: StructType, q: StructType) =>
        val pm = p.fields.map(f => f.name -> f.dataType).toMap
        q.fields.forall(f => pm.get(f.name).forall(canMerge(_, f.dataType)))
      case (StringType, StringType)           => true
      case (_: ArrayType, _) | (_, _: ArrayType) => false
      case (_: StructType, _) | (_, _: StructType) => false
      case _                                  => true
    }
  }

  /** Chained struct access for a non-wildcard path over the shared parsed
    * column. The leaf is StringType: Spark's Jackson converter stringifies
    * scalars by token text and nested subtrees by raw JSON — the same
    * observable values `get_json_object` yields.
    */
  private def scalarField(parsed: Column, segs: Seq[Seg]): Column =
    segs.foldLeft(parsed)((e, s) => e.getField(s.name))

  /** All matches of a wildcard pattern as `array<string>` (the reference's
    * `[match.value for match in pattern.find(msg)]`, values stringified),
    * extracted from the shared parsed-message column. Nested `[*]` levels
    * flatten; nulls (absent fields under a present spine) drop out of the
    * match list.
    */
  private def multiMatch(parsed: Column, segs: Seq[Seg]): Column = {
    var expr: Column = parsed
    var isArr = false
    segs.foreach { seg =>
      if (!isArr) {
        expr = expr.getField(seg.name)
        if (seg.wild) isArr = true
      } else {
        val mapped = transform(expr, _.getField(seg.name))
        expr = if (seg.wild) flatten(mapped) else mapped
      }
    }
    val arr = if (isArr) expr else array(expr)
    filter(arr, v => v.isNotNull)
  }

  private def rulePredicate(r: Rule, extracted: Map[String, Column]): Column = {
    val preds = r.clauses.map(clausePredicate(_, extracted))
    if (r.logic == "AND") preds.reduce(_ && _) else preds.reduce(_ || _)
  }

  /** Apply the filter: returns the surviving rows. `jsonCol` is the JSON
    * message column the patterns index into, `orderCol` defines the
    * deterministic arrival order for sampling.
    *
    * Pass/drop rows never touch the window: they survive on a pure codegen'd
    * filter. Only rows whose first-match rule is a `sample N` pay the
    * occurrence-numbering shuffle, and that window runs over just those rows
    * (windowing the whole stream partitioned by a handful of rule ids would
    * serialize 100 TB through a few partitions).
    */
  def apply(events: DataFrame, rules: Seq[String], jsonCol: String = "props",
            orderCol: String = "event_id",
            sampleMode: SampleMode = SampleMode.Counter): DataFrame = {
    val (parsed, default) = parseRules(rules)
    val actions: Seq[Action] = parsed.map(_.action) :+ default
    // Parse the JSON message ONCE per distinct referenced path: the rule
    // chain references each path in several when-branches, and a naive
    // get_json_object per clause re-parses the message per reference (4×+
    // per row — the dominant ingest cost at 100 TB). Projecting the
    // extraction behind an alias is stable because CollapseProject never
    // duplicates non-cheap expressions into multiple consumers.
    val paths = parsed.flatMap(_.clauses.map(_.path)).distinct
    val pathCol = paths.zipWithIndex.map { case (p, i) => p -> s"__wf_jp$i" }.toMap
    // ALL paths — wildcard match spines and scalar leaves — share ONE
    // from_json over their merged schema: the parse is the dominant per-row
    // cost (at 100 TB, k parses per row vs one is the ingest bill), and
    // CollapseProject keeps the single projected parse from being duplicated
    // into its consumers. A scalar path whose spine type-conflicts with the
    // merged tree (e.g. `a.b` next to `a.b[*].c`) falls back to its own
    // get_json_object rather than corrupting the shared schema.
    //
    // Malformed-row semantics of the shared parse: when a row's RUNTIME
    // shape conflicts with the merged schema on one subtree (one row's
    // `src` is an object where the schema says array), the shared from_json
    // must not null out sibling extractions for that row. That containment
    // is what `spark.sql.json.enablePartialResults` provides (Spark 4.x
    // default true) — Bench/Verify pin it explicitly, and
    // WardenFilterSpec("heterogeneous runtime shapes") locks the behavior.
    // Without it the reference's independent per-path extraction would
    // differ on such rows.
    val allSegs = paths.map(p => p -> parseSegs(p)).toMap
    // wildcard paths claim the tree first (their array spines usually
    // agree); any path — wildcard or scalar — whose spine type-conflicts
    // with the merged tree (e.g. `a[*]` next to `a[*].b`, or `a.b` next to
    // `a.b[*].c`) falls back to its own extraction below. Scalars fall back
    // to get_json_object; wildcards to a per-path from_json over their own
    // schema (a wildcard match list cannot come out of get_json_object —
    // the clause needs an array<string>, not a JSON-text scalar).
    val ordered = allSegs.toSeq.sortBy { case (p, _) => (!isWildcard(p), p) }
    val (mergedSchema, mergedPaths) = ordered
      .foldLeft((Option.empty[org.apache.spark.sql.types.StructType], Set.empty[String])) {
        case ((None, done), (p, segs)) => (Some(matchSchema(segs)), done + p)
        case ((Some(acc), done), (p, segs)) =>
          val s = matchSchema(segs)
          if (canMerge(acc, s)) (Some(mergeSchemas(acc, s)), done + p)
          else (Some(acc), done)
      }
    val withParsed = mergedSchema match {
      case Some(schema) => events.withColumn("__wf_parsed", from_json(col(jsonCol), schema))
      case None         => events
    }
    val projected = pathCol.foldLeft(withParsed) { case (df, (p, c)) =>
      if (isWildcard(p) && mergedPaths(p))
        df.withColumn(c, multiMatch(col("__wf_parsed"), allSegs(p)))
      else if (isWildcard(p))
        // conflicting wildcard: its own focused parse, same multi-match
        // semantics — one extra parse per such path, paid only on conflict
        df.withColumn(c, multiMatch(from_json(col(jsonCol), matchSchema(allSegs(p))), allSegs(p)))
      else if (mergedPaths(p))
        df.withColumn(c, scalarField(col("__wf_parsed"), allSegs(p)))
      else df.withColumn(c, get_json_object(col(jsonCol), "$." + p))
    }
    val extracted = pathCol.map { case (p, c) => p -> col(c) }
    // first-match-wins rule index; index == parsed.length means default
    val ruleIdx = parsed.zipWithIndex
      .foldRight(lit(parsed.length): Column) { case ((r, i), acc) =>
        when(rulePredicate(r, extracted), lit(i)).otherwise(acc)
      }
    val withRule = projected.withColumn("_rule", ruleIdx)
    val passIdx = actions.zipWithIndex.collect { case (Pass, i) => i }
    val samples = actions.zipWithIndex.collect { case (SampleN(n), i) => (i, n) }
    val helperCols = pathCol.values.toSeq ++
      (if (mergedSchema.isEmpty) Seq("_rule") else Seq("__wf_parsed", "_rule"))
    val passRows =
      if (passIdx.isEmpty) events.limit(0)
      else withRule.filter(col("_rule").isInCollection(passIdx)).drop(helperCols: _*)
    if (samples.isEmpty) passRows
    else sampleMode match {
      case SampleMode.Counter =>
        val sampleRows = withRule
          .filter(col("_rule").isInCollection(samples.map(_._1)))
          .withColumn("_occ",
            row_number().over(Window.partitionBy(col("_rule")).orderBy(col(orderCol))))
        val keep = samples.map { case (i, n) =>
          col("_rule") === i && col("_occ") % n === 0
        }.reduce(_ || _)
        passRows.unionByName(sampleRows.filter(keep).drop(helperCols :+ "_occ": _*))
      case SampleMode.Hash =>
        // no occurrence index, no window, no shuffle: a pure codegen filter
        val keep = samples.map { case (i, n) =>
          col("_rule") === i && pmod(hash(col(orderCol)), lit(n)) === 0
        }.reduce(_ || _)
        passRows.unionByName(withRule.filter(keep).drop(helperCols: _*))
    }
  }
}
