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

  private def clausePredicate(c: Clause, extracted: Map[String, Column]): Column = {
    val matched = extracted(c.path)
    c.op match {
      case "="  => coalesce(matched === c.value, lit(false))
      case "!=" => !coalesce(matched === c.value, lit(false))
    }
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
            orderCol: String = "event_id"): DataFrame = {
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
    val projected = pathCol.foldLeft(events) { case (df, (p, c)) =>
      df.withColumn(c, get_json_object(col(jsonCol), "$." + p))
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
    val helperCols = pathCol.values.toSeq :+ "_rule"
    val passRows =
      if (passIdx.isEmpty) events.limit(0)
      else withRule.filter(col("_rule").isInCollection(passIdx)).drop(helperCols: _*)
    if (samples.isEmpty) passRows
    else {
      val sampleRows = withRule
        .filter(col("_rule").isInCollection(samples.map(_._1)))
        .withColumn("_occ",
          row_number().over(Window.partitionBy(col("_rule")).orderBy(col(orderCol))))
      val keep = samples.map { case (i, n) =>
        col("_rule") === i && col("_occ") % n === 0
      }.reduce(_ || _)
      passRows.unionByName(sampleRows.filter(keep).drop(helperCols :+ "_occ": _*))
    }
  }
}
