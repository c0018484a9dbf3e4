package graft.tagsdsl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The NERD tags rule DSL compiled to Catalyst `Column`s.
  *
  * Grammar and evaluation semantics follow the reference implementation
  * (`NERDd/modules/tags.py:264–920`, grammar documented in
  * `etc/tags.yml:1–45`):
  *
  *   cond_or   := cond_and (OR cond_and)*
  *   cond_and  := cond_part (AND cond_part)*
  *   cond_part := NOT cond_part
  *              | math_expr [ (==|!=|<|<=|>|>=) math_expr
  *                          | [NOT] IN (ident | jsonpath) ]
  *   math_expr := math_times ((+|-) math_times)*
  *   math_times:= operand ((*|/) operand)*
  *   operand   := ident | 'string' | `jsonpath` | number | - operand
  *              | ( cond_or )
  *
  * The reference's lenient dynamic-typing rules (`tags.py:509–720`) are
  * reproduced through a static "kind" per AST node resolved against the
  * DataFrame schema, so everything compiles to ordinary codegen-friendly
  * expressions:
  *  - arithmetic coerces non-numbers: None/False ⇒ 0, any other non-number
  *    (string, list, True) ⇒ 1; division by zero ⇒ 0
  *  - comparisons never throw: a Python comparison TypeError (None or
  *    mixed-type operands under </<=/>/>=) becomes `false`; `==` between
  *    operands of different types is `false` unless both are None (⇒ true,
  *    via null-safe equality)
  *  - `in`/`not in`: a missing/None collection ⇒ false for BOTH variants
  *    (the reference catches the TypeError and returns False regardless of
  *    polarity); a None item in a present collection ⇒ `in` false,
  *    `not in` true
  *  - and/or coerce operands to logical: bool as-is, number ≠ 0, other
  *    non-None ⇒ true; `not` uses Python truthiness (empty string/list ⇒
  *    falsy), which differs from the and/or coercion — both are mirrored
  *  - top-level condition: None/False/0/[] ⇒ not tagged
  *    (`tags.py:957–970` `evaluate_logical`)
  *  - confidence: number as-is, None/False ⇒ 0, anything else ⇒ 1
  *    (`tags.py:972–989` `evaluate_mathematical`)
  *  - strings interpolate `{attr}` placeholders, leaving the placeholder
  *    verbatim when the attribute is missing (`tags.py:655–677`)
  *
  * Missing attributes are resolved at COMPILE time against the schema (the
  * reference checks the record dict at eval time); a path absent from the
  * schema behaves exactly like Python None. Backtick JSONPath expressions
  * (`tags.py:477–492`) support the scalar `$.a.b` subset over a designated
  * JSON string column via `get_json_object`.
  */
object TagsDsl {

  // ---------------------------------------------------------------- lexer
  private sealed trait Tok
  private object Tok {
    case object EOI extends Tok
    case object Plus extends Tok
    case object Minus extends Tok
    case object Times extends Tok
    case object Div extends Tok
    case object LPar extends Tok
    case object RPar extends Tok
    case object Eq extends Tok
    case object Neq extends Tok
    case object Lt extends Tok
    case object Lte extends Tok
    case object Gt extends Tok
    case object Gte extends Tok
    case object And extends Tok
    case object Or extends Tok
    case object Not extends Tok
    case object In extends Tok
    final case class Ident(path: String) extends Tok
    final case class Str(s: String) extends Tok
    final case class Json(path: String) extends Tok
    final case class Num(v: Double, integral: Boolean) extends Tok
  }

  private def lex(s: String): List[Tok] = {
    val out = List.newBuilder[Tok]
    var i = 0
    def fail(msg: String) = throw new IllegalArgumentException(s"tags DSL: $msg at pos $i in: $s")
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ' ') i += 1
      else if (c == '+') { out += Tok.Plus; i += 1 }
      else if (c == '-') { out += Tok.Minus; i += 1 }
      else if (c == '*') { out += Tok.Times; i += 1 }
      else if (c == '/') { out += Tok.Div; i += 1 }
      else if (c == '(') { out += Tok.LPar; i += 1 }
      else if (c == ')') { out += Tok.RPar; i += 1 }
      else if (c == '=') {
        if (i + 1 < s.length && s.charAt(i + 1) == '=') { out += Tok.Eq; i += 2 }
        else fail("'=' must be '=='")
      } else if (c == '!') {
        if (i + 1 < s.length && s.charAt(i + 1) == '=') { out += Tok.Neq; i += 2 }
        else fail("'!' must be '!='")
      } else if (c == '<') {
        if (i + 1 < s.length && s.charAt(i + 1) == '=') { out += Tok.Lte; i += 2 }
        else { out += Tok.Lt; i += 1 }
      } else if (c == '>') {
        if (i + 1 < s.length && s.charAt(i + 1) == '=') { out += Tok.Gte; i += 2 }
        else { out += Tok.Gt; i += 1 }
      } else if (c == '\'' || c == '"') {
        val close = s.indexOf(c, i + 1)
        if (close < 0) fail("unterminated string")
        out += Tok.Str(s.substring(i + 1, close)); i = close + 1
      } else if (c == '`') {
        val close = s.indexOf('`', i + 1)
        if (close < 0) fail("unterminated JSONPath")
        out += Tok.Json(s.substring(i + 1, close)); i = close + 1
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_' || s.charAt(i) == '.')) i += 1
        s.substring(start, i) match {
          case "and" => out += Tok.And
          case "or"  => out += Tok.Or
          case "not" => out += Tok.Not
          case "in"  => out += Tok.In
          case ident => out += Tok.Ident(ident)
        }
      } else if (c.isDigit || c == '.') {
        val start = i
        var dots = 0
        while (i < s.length && (s.charAt(i).isDigit || s.charAt(i) == '.')) {
          if (s.charAt(i) == '.') dots += 1
          i += 1
        }
        if (dots > 1) fail("not a valid number")
        val text = s.substring(start, i)
        out += Tok.Num(text.toDouble, integral = dots == 0)
      } else fail(s"unexpected character '$c'")
    }
    out += Tok.EOI
    out.result()
  }

  // ----------------------------------------------------------------- AST
  sealed trait Ast
  final case class Attr(path: String) extends Ast
  final case class NumLit(v: Double, integral: Boolean) extends Ast
  final case class StrLit(s: String) extends Ast
  final case class JsonPath(path: String) extends Ast
  final case class Bin(op: String, l: Ast, r: Ast) extends Ast
  final case class InOp(item: Ast, coll: Ast, positive: Boolean) extends Ast
  final case class Neg(e: Ast) extends Ast
  final case class UMinus(e: Ast) extends Ast

  /** Recursive-descent parser mirroring the reference grammar
    * (`tags.py:726–920`); also collects referenced attribute paths (the
    * reference's trigger set, `tags.py:736–752`).
    */
  final class Parser(tokens: List[Tok]) {
    private var toks = tokens
    val triggers = scala.collection.mutable.Set.empty[String]
    private def peek: Tok = toks.head
    private def next(): Tok = { val t = toks.head; toks = toks.tail; t }
    private def fail(msg: String) = throw new IllegalArgumentException(s"tags DSL parse error: $msg (at $peek)")

    private def record(t: Tok): Unit = t match {
      case Tok.Ident(p) => triggers += p
      case Tok.Json(p) =>
        // extract only the top-level field name, like the reference
        "[a-zA-Z0-9_-]+".r.findFirstIn(p).foreach(triggers += _)
      case _ =>
    }

    def parse(): Ast = {
      val ast = condOr()
      if (peek != Tok.EOI) fail("trailing input")
      ast
    }

    private def condOr(): Ast = {
      var l = condAnd()
      while (peek == Tok.Or) { next(); l = Bin("or", l, condAnd()) }
      l
    }
    private def condAnd(): Ast = {
      var l = condPart()
      while (peek == Tok.And) { next(); l = Bin("and", l, condPart()) }
      l
    }
    private def condPart(): Ast = peek match {
      case Tok.Not =>
        next(); Neg(condPart())
      case _ =>
        val left = mathExpr()
        peek match {
          case Tok.Eq  => next(); Bin("==", left, mathExpr())
          case Tok.Neq => next(); Bin("!=", left, mathExpr())
          case Tok.Lt  => next(); Bin("<", left, mathExpr())
          case Tok.Lte => next(); Bin("<=", left, mathExpr())
          case Tok.Gt  => next(); Bin(">", left, mathExpr())
          case Tok.Gte => next(); Bin(">=", left, mathExpr())
          case Tok.In  => next(); InOp(left, inRhs(), positive = true)
          case Tok.Not =>
            next()
            if (peek != Tok.In) fail("expected 'in' after 'not'")
            next(); InOp(left, inRhs(), positive = false)
          case _ => left
        }
    }
    private def inRhs(): Ast = next() match {
      case t @ Tok.Ident(p) => record(t); Attr(p)
      case t @ Tok.Json(p)  => record(t); JsonPath(p)
      case other            => fail(s"'in' right side must be attribute or JSONPath, got $other")
    }
    private def mathExpr(): Ast = {
      var l = mathTimes()
      var go = true
      while (go) peek match {
        case Tok.Plus  => next(); l = Bin("+", l, mathTimes())
        case Tok.Minus => next(); l = Bin("-", l, mathTimes())
        case _         => go = false
      }
      l
    }
    private def mathTimes(): Ast = {
      var l = operand()
      var go = true
      while (go) peek match {
        case Tok.Times => next(); l = Bin("*", l, operand())
        case Tok.Div   => next(); l = Bin("/", l, operand())
        case _         => go = false
      }
      l
    }
    private def operand(): Ast = peek match {
      case t @ Tok.Ident(p) => next(); record(t); Attr(p)
      case Tok.Str(v)       => next(); StrLit(v)
      case t @ Tok.Json(p)  => next(); record(t); JsonPath(p)
      case Tok.Num(v, i)    => next(); NumLit(v, i)
      case Tok.Minus        => next(); UMinus(operand())
      case Tok.LPar =>
        next()
        val e = condOr()
        if (peek != Tok.RPar) fail("expected ')'")
        next(); e
      case other => fail(s"unexpected $other in operand position")
    }
  }

  def parse(condition: String): (Ast, Set[String]) = {
    val p = new Parser(lex(condition))
    val ast = p.parse()
    (ast, p.triggers.toSet)
  }

  // ------------------------------------------------------------- compiler

  /** Static value kind standing in for Python's dynamic types. */
  sealed trait Kind
  case object KNum extends Kind
  case object KStr extends Kind
  case object KBool extends Kind
  final case class KArr(elem: Kind) extends Kind
  case object KNull extends Kind // statically-missing attribute ⇒ Python None

  final case class Typed(col: Column, kind: Kind)

  final case class Ctx(schema: StructType, jsonCol: Option[String] = None)

  private def kindOf(dt: DataType): Kind = dt match {
    case _: NumericType                => KNum
    case BooleanType                   => KBool
    case StringType                    => KStr
    case ArrayType(e, _)               => KArr(kindOf(e))
    case DateType | TimestampType      => KStr // compared as ISO strings
    case _                             => KStr
  }

  /** Resolve a dot-path against the schema; absent ⇒ Python None
    * (`tags.py:450–474` Var returns None for missing keys).
    */
  private def resolve(path: String, ctx: Ctx): Typed = {
    def walk(dt: DataType, parts: List[String]): Option[DataType] = (dt, parts) match {
      case (d, Nil) => Some(d)
      case (st: StructType, h :: t) =>
        st.fields.find(_.name == h).flatMap(f => walk(f.dataType, t))
      case _ => None
    }
    walk(ctx.schema, path.split('.').toList) match {
      case Some(dt) =>
        val c = col(path)
        kindOf(dt) match {
          case KStr if dt == DateType || dt == TimestampType => Typed(c.cast("string"), KStr)
          case k => Typed(c, k)
        }
      case None => Typed(lit(null), KNull)
    }
  }

  /** `eval_operand_to_logical` (`tags.py:519–525`): bool as-is, number ≠ 0,
    * other non-None ⇒ true.
    */
  private def toLogical(t: Typed): Column = t.kind match {
    case KBool   => coalesce(t.col, lit(false))
    case KNum    => coalesce(t.col =!= 0d, lit(false))
    case KNull   => lit(false)
    case _       => t.col.isNotNull
  }

  /** Python truthiness for `not` (`tags.py:639–653`): empty string/list are
    * falsy, unlike the and/or coercion above.
    */
  private def truthy(t: Typed): Column = t.kind match {
    case KBool   => coalesce(t.col, lit(false))
    case KNum    => coalesce(t.col =!= 0d, lit(false))
    case KNull   => lit(false)
    case KStr    => t.col.isNotNull && length(t.col) > 0
    case KArr(_) => t.col.isNotNull && size(t.col) > 0
  }

  /** Arithmetic coercion (`tags.py:549–563`): None/False ⇒ 0, non-number ⇒ 1. */
  private def toNumber(t: Typed): Column = t.kind match {
    case KNum  => coalesce(t.col.cast("double"), lit(0d))
    case KBool => coalesce(t.col.cast("int").cast("double"), lit(0d))
    case KNull => lit(0d)
    case _     => when(t.col.isNull, 0d).otherwise(1d)
  }

  private def compile(ast: Ast, ctx: Ctx): Typed = ast match {
    case Attr(p)          => resolve(p, ctx)
    case NumLit(v, true)  => Typed(lit(v.toLong), KNum)
    case NumLit(v, false) => Typed(lit(v), KNum)
    case StrLit(s)        => Typed(interpolate(s, ctx), KStr)
    case JsonPath(p) =>
      ctx.jsonCol match {
        case Some(jc) => Typed(get_json_object(col(jc), p), KStr)
        case None     => Typed(lit(null), KNull)
      }

    case Neg(e) =>
      Typed(!truthy(compile(e, ctx)), KBool)

    case UMinus(e) =>
      Typed(-toNumber(compile(e, ctx)), KNum)

    case Bin("and", l, r) =>
      Typed(toLogical(compile(l, ctx)) && toLogical(compile(r, ctx)), KBool)
    case Bin("or", l, r) =>
      Typed(toLogical(compile(l, ctx)) || toLogical(compile(r, ctx)), KBool)

    case Bin(op @ ("+" | "-" | "*" | "/"), l, r) =>
      val ln = toNumber(compile(l, ctx))
      val rn = toNumber(compile(r, ctx))
      val c = op match {
        case "+" => ln + rn
        case "-" => ln - rn
        case "*" => ln * rn
        // ZeroDivisionError ⇒ 0 (`tags.py:571–575`)
        case "/" => when(rn === 0d, 0d).otherwise(ln / rn)
      }
      Typed(c, KNum)

    case Bin(op, l, r) => // == != < <= > >=
      Typed(compare(op, compile(l, ctx), compile(r, ctx)), KBool)

    case InOp(item, coll, positive) =>
      val it = compile(item, ctx)
      val cl = compile(coll, ctx)
      Typed(membership(it, cl, positive), KBool)
  }

  /** Comparison semantics (`tags.py:577–589`): Python comparison exceptions
    * ⇒ False. Mixed-type `==` is False (except None == None ⇒ True, which
    * null-safe equality gives for same-kind nullable operands); mixed-type
    * ordering raises in Python ⇒ False here. Python bools are numbers
    * (True == 1), so bool operands are normalized to ints first.
    */
  private def compare(op: String, l0: Typed, r0: Typed): Column = {
    def norm(t: Typed): Typed = t.kind match {
      case KBool => Typed(t.col.cast("int"), KNum)
      case _     => t
    }
    val l = norm(l0)
    val r = norm(r0)
    val sameKind = (l.kind, r.kind) match {
      case (a, b) if a == b   => true
      case (KNull, _) | (_, KNull) => false
      case _                  => false
    }
    (op, l.kind, r.kind) match {
      case ("==", KNull, KNull) => lit(true)  // None == None
      case ("!=", KNull, KNull) => lit(false)
      case ("==", _, _) if !sameKind => l.col.isNull && r.col.isNull
      case ("!=", _, _) if !sameKind => !(l.col.isNull && r.col.isNull)
      case ("==", _, _) => l.col <=> r.col
      case ("!=", _, _) => !(l.col <=> r.col)
      case (_, _, _) if !sameKind => lit(false) // ordering TypeError ⇒ False
      case ("<", _, _)  => coalesce(l.col < r.col, lit(false))
      case ("<=", _, _) => coalesce(l.col <= r.col, lit(false))
      case (">", _, _)  => coalesce(l.col > r.col, lit(false))
      case (">=", _, _) => coalesce(l.col >= r.col, lit(false))
    }
  }

  /** `in` / `not in` (`tags.py:590–616`): evaluation exceptions (missing or
    * non-container collection) ⇒ False for BOTH polarities; a None item in a
    * present container: `in` ⇒ False, `not in` ⇒ True. Strings support
    * Python's substring membership.
    */
  private def membership(item: Typed, coll: Typed, positive: Boolean): Column = {
    def polarity(c: Column): Column = if (positive) c else !c
    coll.kind match {
      case KArr(ek) =>
        val comparable = ek == item.kind ||
          (ek == KNum && item.kind == KBool) || (ek == KBool && item.kind == KNum)
        if (!comparable)
          // Python `5 in ['a']` ⇒ False without exception; not-in ⇒ True
          when(coll.col.isNull, lit(false)).otherwise(lit(!positive))
        else
          when(coll.col.isNull, lit(false))
            .when(item.col.isNull, lit(!positive))
            .otherwise(polarity(array_contains(coll.col, item.col)))
      case KStr =>
        if (item.kind != KStr) lit(false) // TypeError ⇒ False both ways
        else
          when(coll.col.isNull || item.col.isNull, lit(false))
            .otherwise(polarity(coll.col.contains(item.col)))
      case _ => lit(false) // None / non-container ⇒ TypeError ⇒ False
    }
  }

  /** `{attr}` interpolation (`tags.py:655–677`): placeholders whose attribute
    * is missing/None stay verbatim in the output string.
    */
  private def interpolate(s: String, ctx: Ctx): Column = {
    val pattern = "\\{([a-zA-Z0-9_.]+)\\}".r
    val pieces = scala.collection.mutable.ArrayBuffer.empty[Column]
    var last = 0
    for (m <- pattern.findAllMatchIn(s)) {
      if (m.start > last) pieces += lit(s.substring(last, m.start))
      val t = resolve(m.group(1), ctx)
      val rendered = t.kind match {
        case KArr(_) => concat(lit("["), array_join(t.col, ", "), lit("]"))
        case _       => t.col.cast("string")
      }
      pieces += when(t.col.isNull, lit(s"{${m.group(1)}}")).otherwise(rendered)
      last = m.end
    }
    if (last < s.length) pieces += lit(s.substring(last))
    if (pieces.isEmpty) lit("") else concat(pieces.toSeq: _*)
  }

  // ------------------------------------------------------------ public API

  /** A compiled condition: `logical` decides tag presence
    * (`evaluate_logical`: None/False/0/[] ⇒ false), `confidence` is
    * `evaluate_mathematical` (number as-is, None/False ⇒ 0, other ⇒ 1),
    * `triggers` are the referenced attribute paths.
    */
  final case class Compiled(logical: Column, confidence: Column, triggers: Set[String])

  def compileCondition(condition: String, schema: StructType,
                       jsonCol: Option[String] = None): Compiled = {
    val (ast, triggers) = parse(condition)
    val ctx = Ctx(schema, jsonCol)
    val t = compile(ast, ctx)
    val logical = t.kind match {
      case KBool   => coalesce(t.col, lit(false))
      case KNum    => coalesce(t.col =!= 0d, lit(false))
      case KNull   => lit(false)
      case KStr    => t.col.isNotNull // "" is NOT in evaluate_logical's false set
      case KArr(_) => t.col.isNotNull && size(t.col) =!= 0
    }
    val confidence = (t.kind match {
      case KNum  => coalesce(t.col, lit(0d))
      case KBool => coalesce(t.col.cast("int"), lit(0))
      case KNull => lit(0d)
      case _     => when(t.col.isNull, 0d).otherwise(1d)
    }).cast("double")
    Compiled(logical, confidence, triggers)
  }

  /** An info template is a bare string with `{attr}` placeholders
    * (`tags.py:121–139` wraps it in quotes before lexing).
    */
  def compileInfo(template: String, schema: StructType): Column =
    interpolate(template, Ctx(schema))
}
