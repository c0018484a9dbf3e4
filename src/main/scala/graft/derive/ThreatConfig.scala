package graft.derive

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.derive.ThreatCategorize.CatRule
import graft.tagsdsl.TagsDsl

/** Threat-categorization rules compiled FROM CONFIG, not hand-authored code —
  * the reference evaluates Python-expression trigger strings from
  * `etc/threat_categorization.yml` (`common/threat_categorization.py:112–185`
  * `classify_ip`/`eval_trigger`). Rule changes there are config edits; this
  * compiler gives the same property: a yml string becomes `CatRule` Columns.
  *
  * Trigger grammar (documented in `etc/threat_categorization.yml:27–50`):
  *  - one trigger per line; a category fires on the FIRST line that matches
  *  - `COND -> {'subcat': [values]}` attaches a subcategory payload
  *  - the reference's recurring Python idioms are lowered structurally:
  *      `bool(re.findall(r'RE', event.a + event.b))` ⇒ `concat(a,b) rlike RE`
  *      `any([bool(re.findall(r'RE', t)) for t in event.tags])`
  *        ⇒ `exists(tags, t rlike RE)`
  *  - everything else (`event.x == 'lit'`, `'lit' in event.categories`,
  *    and/or/not, comparisons) is the expression subset the tags DSL already
  *    compiles (`graft.tagsdsl.TagsDsl`) — the `event.` prefix maps to bare
  *    column paths.
  *
  * The yml subset parsed here is exactly the shape the reference config uses:
  * a `threat_categories:` mapping of category id → {role, subcategories
  * list, triggers: {module: |- block}}. No external yml library — the
  * structure is three levels of fixed keys and literal blocks.
  */
object ThreatConfig {

  /** One compiled trigger line: predicate + optional subcategory payload. */
  final case class Trigger(cond: Column, payload: Map[String, Seq[String]])

  /** One compiled category: `trigger` is the OR of its lines (assignment),
    * `triggers` keeps line order for first-match payload resolution.
    */
  final case class Category(id: String, role: String,
                            subcategories: Seq[String], triggers: Seq[Trigger]) {
    def rule: CatRule = CatRule(id, role,
      triggers.map(_.cond).reduceOption(_ || _).getOrElse(lit(false)))

    /** Payload values for one subcategory key, first-match semantics
      * (`eval_trigger` is called per line and `classify_ip` breaks on the
      * first True, `threat_categorization.py:126–134`): a `when` chain in
      * line order.
      */
    def payloadFor(subcat: String): Column =
      triggers.foldLeft(lit(null).cast("array<string>")) { (acc, t) =>
        t.payload.get(subcat) match {
          case Some(vs) => coalesce(acc, when(t.cond, typedLit(vs)))
          case None     => acc
        }
      }
  }

  // ------------------------------------------------------------ yml parsing

  /** Raw (uncompiled) category spec from the yml text. */
  final case class RawCategory(id: String, role: String,
                               subcategories: Seq[String],
                               triggers: Map[String, Seq[String]])

  /** Parse the `threat_categories:` section of the reference config shape.
    * Indentation-scoped, comment- and blank-line-tolerant; `|-` literal
    * blocks keep one trigger per line.
    */
  def parseYml(text: String): Seq[RawCategory] = {
    val lines = text.linesIterator.toVector
    def indent(l: String) = l.takeWhile(_ == ' ').length
    def stripComment(l: String) =
      if (l.trim.startsWith("#")) "" else l
    def unquote(s: String) = {
      val t = s.trim
      if (t.length >= 2 && (t.head == '"' || t.head == '\'') && t.last == t.head)
        t.substring(1, t.length - 1)
      else t
    }

    val out = scala.collection.mutable.ArrayBuffer.empty[RawCategory]
    // locate the top-level mapping key
    val start = lines.indexWhere(l => l.trim == "threat_categories:")
    if (start < 0) return out.toSeq
    var i = start + 1
    var cur: Option[(String, scala.collection.mutable.Map[String, Any])] = None

    def flush(): Unit = cur.foreach { case (id, m) =>
      out += RawCategory(id,
        m.getOrElse("role", "src").toString,
        m.get("subcategories").map(_.asInstanceOf[Seq[String]]).getOrElse(Nil),
        m.get("triggers").map(_.asInstanceOf[Map[String, Seq[String]]]).getOrElse(Map.empty))
      cur = None
    }

    while (i < lines.length) {
      val raw = stripComment(lines(i))
      val t = raw.trim
      if (t.isEmpty) i += 1
      else if (indent(raw) == 0) { i = lines.length } // left the section
      else if (indent(raw) == 2 && t.endsWith(":")) { // new category id
        flush()
        cur = Some((t.dropRight(1), scala.collection.mutable.Map.empty[String, Any]))
        i += 1
      } else if (cur.isDefined && indent(raw) == 4) {
        val m = cur.get._2
        t.split(":", 2) match {
          case Array("subcategories", _*) =>
            i += 1
            val items = scala.collection.mutable.ArrayBuffer.empty[String]
            while (i < lines.length && lines(i).trim.startsWith("- ")) {
              items += lines(i).trim.drop(2).trim; i += 1
            }
            m("subcategories") = items.toSeq
          case Array("triggers", _*) =>
            i += 1
            val sections = scala.collection.mutable.Map.empty[String, Seq[String]]
            while (i < lines.length && indent(stripComment(lines(i))) == 6 &&
                   stripComment(lines(i)).trim.nonEmpty) {
              val head = lines(i).trim
              val name = head.takeWhile(_ != ':')
              i += 1
              val block = scala.collection.mutable.ArrayBuffer.empty[String]
              if (head.endsWith("|-") || head.endsWith("|")) {
                while (i < lines.length && (lines(i).trim.isEmpty || indent(lines(i)) >= 8)) {
                  if (lines(i).trim.nonEmpty) block += lines(i).trim
                  i += 1
                }
              } else {
                // inline scalar: a single trigger on the same line
                val inline = head.dropWhile(_ != ':').drop(1).trim
                if (inline.nonEmpty) block += unquote(inline)
              }
              sections(name) = block.toSeq
            }
            m("triggers") = sections.toMap
          case Array(k, v) => m(k.trim) = unquote(v)
          case _           => ()
        }
        if (!t.startsWith("subcategories") && !t.startsWith("triggers")) i += 1
      } else i += 1
    }
    flush()
    out.toSeq
  }

  // ------------------------------------------------------- trigger compiler

  private val PayloadRe = """^(.*?)\s*->\s*(\{.*\})\s*$""".r
  private val FindallRe = """^bool\(re\.findall\(r'([^']*)',\s*(.+)\)\)$""".r
  private val AnyTagRe =
    """^any\(\[bool\(re\.findall\(r'([^']*)',\s*(\w+)\)\)\s+for\s+\2\s+in\s+event\.([\w.]+)\]\)$""".r

  /** Resolve `event.path` against the schema; absent ⇒ null (the reference's
    * `ClassifiableEvent.__getattr__` returns None for missing attributes).
    */
  private def hasCol(path: String, schema: StructType): Boolean =
    schema.fieldNames.contains(path.stripPrefix("event.").split('.').head)

  private def eventCol(path: String, schema: StructType): Column =
    if (hasCol(path, schema)) col(path.stripPrefix("event."))
    else lit(null).cast("string")

  /** Compile one trigger line (payload suffix already stripped). */
  private def compileCond(line: String, schema: StructType): Column = line.trim match {
    case AnyTagRe(re, _, attr) =>
      // missing list attribute ⇒ comprehension over None raises ⇒ False
      if (!hasCol(s"event.$attr", schema)) lit(false)
      else coalesce(exists(col(attr), t => t.rlike(re)), lit(false))
    case FindallRe(re, args) =>
      // args: one or more `event.x` terms joined by '+' (string concat)
      val parts = args.split("""\s*\+\s*""").toSeq.map(a => coalesce(eventCol(a.trim, schema), lit("")))
      val text = if (parts.size == 1) parts.head else concat(parts: _*)
      coalesce(text.rlike(re), lit(false))
    case other =>
      // expression subset → tags DSL; `event.` prefixes become column paths
      TagsDsl.compileCondition(other.replace("event.", ""), schema).logical
  }

  /** Parse the `-> {'k': [v, ...], ...}` payload dict (values stringified —
    * subcategory members travel as strings, `threat_categorization.py:57`).
    */
  private[derive] def parsePayload(s: String): Map[String, Seq[String]] = {
    val entry = """'([^']+)'\s*:\s*\[([^\]]*)\]""".r
    entry.findAllMatchIn(s).map { m =>
      val vals = m.group(2).split(",").map(_.trim).filter(_.nonEmpty)
        .map(v => if (v.startsWith("'") && v.endsWith("'")) v.substring(1, v.length - 1) else v)
      m.group(1) -> vals.toSeq
    }.toMap
  }

  def compileTrigger(line: String, schema: StructType): Trigger = line.trim match {
    case PayloadRe(cond, payload) => Trigger(compileCond(cond, schema), parsePayload(payload))
    case cond                     => Trigger(compileCond(cond, schema), Map.empty)
  }

  /** Compile the categories relevant to `modules` (a module evaluates its own
    * section plus `general`, `threat_categorization.py:118–120`); categories
    * with no trigger lines for those modules compile to `lit(false)` rules
    * (the `unknown` fallback lives in `ThreatCategorize.classify`).
    */
  def compile(configText: String, schema: StructType,
              modules: Seq[String] = Seq("general")): Seq[Category] =
    parseYml(configText).map { rc =>
      val lines = ("general" +: modules.filterNot(_ == "general"))
        .flatMap(m => rc.triggers.getOrElse(m, Nil))
      Category(rc.id, rc.role, rc.subcategories,
        lines.map(compileTrigger(_, schema)))
    }

  /** Straight to `classify`-ready rules (categories with no triggers — like
    * the reference's `unknown` entry — are dropped; the fallback re-adds
    * them).
    */
  def catRules(configText: String, schema: StructType,
               modules: Seq[String] = Seq("general")): Seq[CatRule] =
    compile(configText, schema, modules).filter(_.triggers.nonEmpty).map(_.rule)

  /** Malpedia `malware_family` subcategory assignment
    * (`threat_categorization.py:170–176`): family ids whose `common_name`
    * approximately matches the `description;ip_info` text, via `match_str`'s
    * simplification (case/`_`/`.`/`-`/whitespace-insensitive containment).
    * Families are config (small, compile-time expansion — no join).
    */
  def malwareFamilyIds(text: Column, families: Seq[(String, String)]): Column = {
    val hits = families.map { case (id, commonName) =>
      when(graft.functions.Funcs.matchStr(lit(commonName), text), lit(id.toLowerCase))
    }
    array_sort(filter(array(hits: _*), h => h.isNotNull))
  }
}
