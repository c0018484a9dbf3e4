package graft.ops

import scala.collection.mutable

/** NERD's record-update operator algebra.
  *
  * Semantics follow the reference op spec (`NERDd/core/update_manager.py:24–65`,
  * implementation `:83–231`): a record is a dynamic nested document; each op
  * targets a dot-path key (decimal segments index arrays, missing intermediate
  * objects are created on demand) and returns the list of `(key, newValue)`
  * pairs actually changed — `None`/empty meaning "no change" (e.g. `add_to_set`
  * of a present value), which in the reference gates the trigger cascade.
  *
  * Divergence (documented): `rem_from_set` is order-preserving here; the
  * reference rebuilds the list via Python set difference with unspecified
  * order (`update_manager.py:140–142`). Set semantics are identical.
  */
object UpdateAlgebra {

  /** Dynamic record: values are Long | Double | String | Boolean | null |
    * mutable.ArrayBuffer[Any] | Rec. LinkedHashMap keeps insertion order so
    * JSON snapshots are deterministic.
    */
  type Rec = mutable.LinkedHashMap[String, Any]
  def newRec(): Rec = mutable.LinkedHashMap.empty[String, Any]

  sealed trait UpdateOp {
    def key: String
    def weak: Boolean
    /** Same op with weakness stripped (applied after the create-gate check). */
    def strong: UpdateOp
  }
  final case class SetVal(key: String, value: Any, weak: Boolean = false) extends UpdateOp { def strong = copy(weak = false) }
  final case class Append(key: String, value: Any, weak: Boolean = false) extends UpdateOp { def strong = copy(weak = false) }
  final case class AddToSet(key: String, value: Any, weak: Boolean = false) extends UpdateOp { def strong = copy(weak = false) }
  final case class ExtendSet(key: String, values: Seq[Any], weak: Boolean = false) extends UpdateOp { def strong = copy(weak = false) }
  final case class RemFromSet(key: String, values: Seq[Any], weak: Boolean = false) extends UpdateOp { def strong = copy(weak = false) }
  final case class AddNum(key: String, value: Any, weak: Boolean = false) extends UpdateOp { def strong = copy(weak = false) }
  final case class SubNum(key: String, value: Any, weak: Boolean = false) extends UpdateOp { def strong = copy(weak = false) }
  final case class SetMax(key: String, value: Any, weak: Boolean = false) extends UpdateOp { def strong = copy(weak = false) }
  final case class SetMin(key: String, value: Any, weak: Boolean = false) extends UpdateOp { def strong = copy(weak = false) }
  final case class RemoveKey(key: String, weak: Boolean = false) extends UpdateOp { def strong = copy(weak = false) }
  /** `rec[key] = rec[keyBase] + ((min - rec[keyBase]) / step + 1) * step` — next
    * multiple of `step` after `min`, anchored at `keyBase` (reference `:174–179`;
    * used for `_nru*` re-update scheduling).
    */
  final case class NextStep(key: String, keyBase: String, min: Long, step: Long, weak: Boolean = false) extends UpdateOp { def strong = copy(weak = false) }
  final case class ArrayUpdate(key: String, query: Seq[(String, Any)], actions: Seq[UpdateOp], weak: Boolean = false) extends UpdateOp { def strong = copy(weak = false) }
  final case class ArrayUpsert(key: String, query: Seq[(String, Any)], actions: Seq[UpdateOp], weak: Boolean = false) extends UpdateOp { def strong = copy(weak = false) }
  final case class ArrayRemove(key: String, query: Seq[(String, Any)], weak: Boolean = false) extends UpdateOp { def strong = copy(weak = false) }
  /** `('event', '!NAME')` — no data change; in the reference it only fires the
    * trigger cascade. `!DELETE` deletes the record (`update_manager.py:640–647`).
    */
  final case class Event(key: String, weak: Boolean = false) extends UpdateOp { def strong = copy(weak = false) }

  /** Numeric tower: comparisons and arithmetic mix Long and Double. */
  private def asD(v: Any): Double = v match {
    case l: Long => l.toDouble
    case d: Double => d
    case i: Int => i.toDouble
    case _ => throw new IllegalArgumentException(s"not a number: $v")
  }
  private def numAdd(a: Any, b: Any): Any = (a, b) match {
    case (x: Long, y: Long) => x + y
    case _ => asD(a) + asD(b)
  }
  private def numNeg(a: Any): Any = a match {
    case x: Long => -x
    case _ => -asD(a)
  }
  private[graft] def valEq(a: Any, b: Any): Boolean = (a, b) match {
    case (x: Long, y: Double) => x.toDouble == y
    case (x: Double, y: Long) => x == y.toDouble
    case _ => a == b
  }
  private def ordMax(a: Any, b: Any): Any = (a, b) match {
    case (x: String, y: String) => if (x >= y) x else y
    case _ => if (asD(a) >= asD(b)) a else b
  }
  private def ordMin(a: Any, b: Any): Any = (a, b) match {
    case (x: String, y: String) => if (x <= y) x else y
    case _ => if (asD(a) <= asD(b)) a else b
  }

  /** Walk a dot-path to the innermost container; create missing intermediate
    * objects (reference `:97–107`). Decimal segments index into arrays at the
    * current position (reference `update_manager.py:100–101` does
    * `rec[int(first_key)]`), so e.g. `set events.0.n` addresses the first
    * element of the `events` array. An out-of-range index or a numeric segment
    * over a non-array throws, matching the reference's uncaught IndexError.
    * Returns (container, lastKey); the final segment must land in an object.
    */
  private def descend(rec: Rec, path: String): (Rec, String) = {
    var cur: Any = rec
    var key = path
    while (key.contains('.')) {
      val i = key.indexOf('.')
      val first = key.substring(0, i)
      key = key.substring(i + 1)
      cur = (cur, first.nonEmpty && first.forall(_.isDigit)) match {
        case (arr: mutable.ArrayBuffer[_], true) =>
          val idx = first.toInt
          if (idx >= arr.length) throw new IllegalArgumentException(
            s"array index $idx out of range (size ${arr.length}) in path $path")
          arr(idx)
        case (m: mutable.LinkedHashMap[_, _], _) =>
          val r = m.asInstanceOf[Rec]
          r.get(first) match {
            case Some(v @ (_: mutable.LinkedHashMap[_, _] | _: mutable.ArrayBuffer[_])) => v
            case _ =>
              val nm = newRec()
              r.update(first, nm)
              nm
          }
        case (other, _) => throw new IllegalArgumentException(
          s"cannot descend segment '$first' into $other (path $path)")
      }
    }
    cur match {
      case m: mutable.LinkedHashMap[_, _] => (m.asInstanceOf[Rec], key)
      case other => throw new IllegalArgumentException(
        s"path $path ends inside non-object $other")
    }
  }

  private def matches(item: Any, query: Seq[(String, Any)]): Boolean = item match {
    case m: mutable.LinkedHashMap[_, _] =>
      val r = m.asInstanceOf[Rec]
      query.forall { case (k, v) => r.get(k).exists(valEq(_, v)) }
    case _ => false
  }

  /** Apply one op; returns changed `(absoluteKey, newValue)` pairs, empty when
    * nothing changed. Mirrors the reference's return contract.
    */
  def performUpdate(rec: Rec, op: UpdateOp): Seq[(String, Any)] = {
    val (r, key) = descend(rec, op.key)
    def one(v: Any): Seq[(String, Any)] = Seq(op.key -> v)
    op match {
      case SetVal(_, value, _) =>
        r.update(key, value); one(value)

      case Append(_, value, _) =>
        val arr = r.getOrElseUpdate(key, mutable.ArrayBuffer.empty[Any]).asInstanceOf[mutable.ArrayBuffer[Any]]
        arr += value; one(arr)

      case AddToSet(_, value, _) =>
        r.get(key) match {
          case None => r.update(key, mutable.ArrayBuffer[Any](value)); one(r(key))
          case Some(arr: mutable.ArrayBuffer[_]) =>
            val a = arr.asInstanceOf[mutable.ArrayBuffer[Any]]
            if (a.exists(valEq(_, value))) Seq.empty
            else { a += value; one(a) }
          case Some(other) => throw new IllegalArgumentException(s"add_to_set on non-array $other")
        }

      case ExtendSet(_, values, _) =>
        r.get(key) match {
          case None => r.update(key, mutable.ArrayBuffer[Any](values: _*)); one(r(key))
          case Some(arr: mutable.ArrayBuffer[_]) =>
            val a = arr.asInstanceOf[mutable.ArrayBuffer[Any]]
            var changed = false
            values.foreach { v => if (!a.exists(valEq(_, v))) { a += v; changed = true } }
            if (changed) one(a) else Seq.empty
          case Some(other) => throw new IllegalArgumentException(s"extend_set on non-array $other")
        }

      case RemFromSet(_, values, _) =>
        r.get(key) match {
          case Some(arr: mutable.ArrayBuffer[_]) =>
            val a = arr.asInstanceOf[mutable.ArrayBuffer[Any]]
            val kept = a.filterNot(x => values.exists(valEq(_, x)))
            r.update(key, kept); one(kept)
          case _ => Seq.empty
        }

      case AddNum(_, value, _) =>
        val nv = r.get(key).map(numAdd(_, value)).getOrElse(value)
        r.update(key, nv); one(nv)

      case SubNum(_, value, _) =>
        val nv = r.get(key).map(numAdd(_, numNeg(value))).getOrElse(numNeg(value))
        r.update(key, nv); one(nv)

      case SetMax(_, value, _) =>
        val nv = r.get(key).map(ordMax(value, _)).getOrElse(value)
        r.update(key, nv); one(nv)

      case SetMin(_, value, _) =>
        val nv = r.get(key).map(ordMin(value, _)).getOrElse(value)
        r.update(key, nv); one(nv)

      case RemoveKey(_, _) =>
        if (r.contains(key)) { r.remove(key); Seq(op.key -> null) } else Seq.empty

      case NextStep(_, keyBase, min, step, _) =>
        val base = r(keyBase) match {
          case l: Long => l
          case d: Double => d.toLong
          case other => throw new IllegalArgumentException(s"next_step base not numeric: $other")
        }
        val nv = base + (Math.floorDiv(min - base, step) + 1) * step
        r.update(key, nv); one(nv)

      case ArrayUpdate(_, query, actions, _) =>
        arrayApply(r, key, op.key, query, actions, upsert = false)
      case ArrayUpsert(_, query, actions, _) =>
        arrayApply(r, key, op.key, query, actions, upsert = true)

      case ArrayRemove(_, query, _) =>
        r.get(key) match {
          case Some(arr: mutable.ArrayBuffer[_]) =>
            val a = arr.asInstanceOf[mutable.ArrayBuffer[Any]]
            val i = a.indexWhere(matches(_, query))
            if (i < 0) Seq.empty
            else { a.remove(i); Seq(s"${op.key}[$i]" -> null) }
          case _ => Seq.empty
        }

      case Event(name, _) =>
        Seq(name -> null)
    }
  }

  private def arrayApply(r: Rec, key: String, absKey: String, query: Seq[(String, Any)],
                         actions: Seq[UpdateOp], upsert: Boolean): Seq[(String, Any)] = {
    val arr = r.get(key) match {
      case Some(a: mutable.ArrayBuffer[_]) => a.asInstanceOf[mutable.ArrayBuffer[Any]]
      case None if upsert =>
        val a = mutable.ArrayBuffer.empty[Any]; r.update(key, a); a
      case _ => return Seq.empty
    }
    var i = arr.indexWhere(matches(_, query))
    if (i < 0) {
      if (!upsert) return Seq.empty
      val item = newRec()
      query.foreach { case (k, v) => item.update(k, v) }
      arr += item
      i = arr.length - 1
    }
    val item = arr(i).asInstanceOf[Rec]
    actions.flatMap { a =>
      performUpdate(item, a).map { case (k, v) => s"$absKey[$i].$k" -> v }
    }
  }

  /** Task-level application (reference `_process_update_req`,
    * `update_manager.py:573–600`): an all-weak task on an absent record is a
    * no-op; otherwise an absent record is created with `ts_added`/
    * `ts_last_update` and `!NEW` is considered fired.
    *
    * @return (record, createdNow, changes) — record is None when the task was
    *         skipped or the record was deleted by `!DELETE`.
    */
  def applyTask(existing: Option[Rec], ops: Seq[UpdateOp], now: Long,
                eid: Any): (Option[Rec], Boolean, Seq[(String, Any)]) = {
    // An empty op list short-circuits before any write — the reference drops
    // empty update_requests as a noop (`update_manager.py:603–607`), so an
    // existing record is returned untouched (no ts_last_update stamp) and an
    // absent record stays absent.
    if (ops.isEmpty) return (existing, false, Seq.empty)
    val allWeak = ops.forall(_.weak)
    existing match {
      case None if allWeak => (None, false, Seq.empty)
      case _ =>
        val created = existing.isEmpty
        val rec = existing.getOrElse {
          val r = newRec()
          r.update("_id", eid)
          r.update("ts_added", now)
          r
        }
        rec.update("ts_last_update", now)
        var deleted = false
        val changes = Seq.newBuilder[(String, Any)]
        if (created) changes += ("!NEW" -> null)
        ops.iterator.takeWhile(_ => !deleted).foreach { op0 =>
          val op = op0.strong
          op match {
            case Event("!DELETE", _) => deleted = true
            case _ => changes ++= performUpdate(rec, op)
          }
        }
        if (deleted) (None, created, changes.result())
        else (Some(rec), created, changes.result())
    }
  }
}
