package graft

import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable

import graft.ops.UpdateAlgebra._
import graft.ops.TaskCodec

/** Unit + property tests for the op algebra, using the reference op spec
  * (`NERDd/core/update_manager.py:24–65`) as the oracle.
  */
class UpdateAlgebraSpec extends AnyFunSuite {

  /** Seeded property runner (scalatestplus bridge isn't in the offline cache). */
  private def forAllSamples[A](gen: scala.util.Random => A, n: Int = 200)(body: A => Unit): Unit = {
    val rnd = new scala.util.Random(42)
    (1 to n).foreach(_ => body(gen(rnd)))
  }

  private def rec(): Rec = newRec()

  test("set creates nested path on demand") {
    val r = rec()
    performUpdate(r, SetVal("events_meta.total", 5L))
    assert(r("events_meta").asInstanceOf[Rec]("total") == 5L)
  }

  test("append creates array; add_to_set is idempotent") {
    val r = rec()
    performUpdate(r, Append("xs", 1L))
    performUpdate(r, Append("xs", 1L))
    assert(r("xs").asInstanceOf[mutable.ArrayBuffer[Any]] == mutable.ArrayBuffer(1L, 1L))
    val changed = performUpdate(r, AddToSet("ys", "a"))
    assert(changed.nonEmpty)
    assert(performUpdate(r, AddToSet("ys", "a")).isEmpty) // no-op signal
    assert(r("ys").asInstanceOf[mutable.ArrayBuffer[Any]] == mutable.ArrayBuffer("a"))
  }

  test("extend_set unions preserving order; rem_from_set removes") {
    val r = rec()
    performUpdate(r, ExtendSet("xs", Seq(1L, 2L)))
    performUpdate(r, ExtendSet("xs", Seq(2L, 3L)))
    assert(r("xs").asInstanceOf[mutable.ArrayBuffer[Any]] == mutable.ArrayBuffer(1L, 2L, 3L))
    performUpdate(r, RemFromSet("xs", Seq(2L)))
    assert(r("xs").asInstanceOf[mutable.ArrayBuffer[Any]] == mutable.ArrayBuffer(1L, 3L))
  }

  test("add/sub init semantics: missing key => v / -v") {
    val r = rec()
    performUpdate(r, AddNum("a", 3L))
    performUpdate(r, AddNum("a", 4L))
    performUpdate(r, SubNum("b", 2L))
    assert(r("a") == 7L)
    assert(r("b") == -2L) // reference update_manager.py:149–154
  }

  test("setmax/setmin monotone fold, mixed numeric types") {
    val r = rec()
    performUpdate(r, SetMax("m", 5L))
    performUpdate(r, SetMax("m", 3L))
    assert(r("m") == 5L)
    performUpdate(r, SetMax("m", 6.5))
    assert(r("m") == 6.5)
    performUpdate(r, SetMin("n", "2024-01-05"))
    performUpdate(r, SetMin("n", "2024-01-02"))
    assert(r("n") == "2024-01-02") // ISO date strings compare as dates
  }

  test("remove deletes subtree, no-op on absent") {
    val r = rec()
    performUpdate(r, SetVal("a.b", 1L))
    assert(performUpdate(r, RemoveKey("a.b")) == Seq("a.b" -> null))
    assert(performUpdate(r, RemoveKey("a.b")).isEmpty)
  }

  test("next_step: smallest base + N*step greater than min") {
    val r = rec()
    performUpdate(r, SetVal("base", 100L))
    performUpdate(r, NextStep("next", "base", 1000L, 60L))
    // base + ((min-base)/step + 1)*step = 100 + (900/60 + 1)*60 = 100 + 16*60 = 1060
    assert(r("next") == 1060L)
  }

  test("array_upsert: first-match keyed merge; array_update no-op when unmatched") {
    val r = rec()
    val q = Seq("date" -> ("2024-01-01": Any), "cat" -> ("scan": Any))
    performUpdate(r, ArrayUpsert("events", q, Seq(AddNum("n", 1L))))
    performUpdate(r, ArrayUpsert("events", q, Seq(AddNum("n", 1L))))
    val arr = r("events").asInstanceOf[mutable.ArrayBuffer[Any]]
    assert(arr.length == 1)
    assert(arr(0).asInstanceOf[Rec]("n") == 2L)
    assert(performUpdate(r, ArrayUpdate("events", Seq("date" -> "1999-01-01"), Seq(AddNum("n", 1L)))).isEmpty)
    performUpdate(r, ArrayRemove("events", q))
    assert(arr.isEmpty)
  }

  test("weak ops don't create records; strong ops do; !DELETE deletes") {
    val (none, created0, _) = applyTask(None, Seq(AddNum("x", 1L, weak = true)), 0L, 42L)
    assert(none.isEmpty && !created0)
    val (some, created1, changes) = applyTask(None, Seq(AddNum("x", 1L, weak = true), SetVal("y", 2L)), 10L, 42L)
    assert(some.nonEmpty && created1)
    assert(changes.head == ("!NEW" -> null)) // !NEW injected at position 0
    assert(some.get("_id") == 42L && some.get("ts_added") == 10L)
    val (deleted, _, _) = applyTask(some, Seq(Event("!DELETE")), 11L, 42L)
    assert(deleted.isEmpty)
  }

  test("empty op list is a no-op on absent AND existing records") {
    val (none, created, changes) = applyTask(None, Seq.empty, 0L, 42L)
    assert(none.isEmpty && !created && changes.isEmpty)
    // reference short-circuits empty update_requests before any write
    // (update_manager.py:603–607): existing record is untouched — no
    // ts_last_update stamp.
    val r = rec(); r.update("_id", 42L)
    val (some, created1, changes1) = applyTask(Some(r), Seq.empty, 99L, 42L)
    assert(some.contains(r) && !created1 && changes1.isEmpty)
    assert(!r.contains("ts_last_update"))
  }

  test("numeric path segments index into arrays (reference update_manager.py:100–101)") {
    val r = rec()
    performUpdate(r, ArrayUpsert("events", Seq("cat" -> "scan"), Seq(AddNum("n", 1L))))
    performUpdate(r, SetVal("events.0.n", 7L))
    val arr = r("events").asInstanceOf[mutable.ArrayBuffer[Any]]
    assert(arr(0).asInstanceOf[Rec]("n") == 7L)
    intercept[IllegalArgumentException] { performUpdate(r, SetVal("events.5.n", 1L)) }
  }

  test("codec round-trips the wire format") {
    val ops = Seq(
      ArrayUpsert("events", Seq("date" -> "2024-01-01", "cat" -> "scan"),
        Seq(AddNum("n", 1L), AddNum("conns", 12.5))),
      AddNum("events_meta.total", 1L),
      SetMax("last_activity", 1704067798L),
      AddToSet("events_meta.types", "scan"),
      RemoveKey("obsolete", weak = true),
      NextStep("_nru1d", "ts_added", 1704067798L, 86400L),
      Event("!every1d"))
    assert(TaskCodec.parse(TaskCodec.render(ops)) == ops)
  }

  test("property: add_to_set idempotent, setmax commutative+associative") {
    forAllSamples(r => List.fill(r.nextInt(20))(r.nextLong())) { xs =>
      val r1 = rec(); val r2 = rec()
      xs.foreach(x => performUpdate(r1, SetMax("m", x)))
      xs.reverse.foreach(x => performUpdate(r2, SetMax("m", x)))
      if (xs.nonEmpty) assert(r1("m") == r2("m") && r1("m") == xs.max)
      val r3 = rec()
      xs.foreach(x => performUpdate(r3, AddToSet("s", x)))
      xs.foreach(x => performUpdate(r3, AddToSet("s", x)))
      assert(r3.get("s").forall(_.asInstanceOf[mutable.ArrayBuffer[Any]].toSeq == xs.distinct))
    }
  }

  test("property: fold total equals relational count") {
    forAllSamples(r => List.fill(r.nextInt(50))((r.nextInt(5), r.nextInt(4)))) { events =>
      events.groupBy(_._1).foreach { case (_, evs) =>
        val r = rec()
        evs.foreach { case (_, c) =>
          performUpdate(r, ArrayUpsert("events", Seq("cat" -> s"c$c"), Seq(AddNum("n", 1L))))
          performUpdate(r, AddNum("total", 1L))
        }
        assert(r("total") == evs.size.toLong)
        val arr = r("events").asInstanceOf[mutable.ArrayBuffer[Any]]
        assert(arr.map(_.asInstanceOf[Rec]("n").asInstanceOf[Long]).sum == evs.size.toLong)
        assert(arr.size == evs.map(_._2).distinct.size)
      }
    }
  }
}
