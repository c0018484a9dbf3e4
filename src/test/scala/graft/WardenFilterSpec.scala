package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.WardenFilter

/** Rule-engine semantics pinned against the reference's `_evaluate_rule`
  * (`warden_receiver.py:209–401`): set-membership `=`/`!=`, first-match-wins,
  * default action, AND/OR no-mixing, deterministic 1-in-N sampling, and the
  * missing-attribute `!=` pass.
  */
class WardenFilterSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def mk(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("event_id", "props")
  }

  test("missing attribute satisfies != (reference semantics)") {
    import spark.implicits._
    val df = mk(1L -> """{"k":"0"}""", 2L -> """{"x":"1"}""")
    val out = WardenFilter(df, Seq("k != 0 ; pass", "; drop"))
      .select($"event_id").as[Long].collect().toSet
    assert(out === Set(2L)) // row 1 has k=0 (fails !=), row 2 lacks k (passes)
  }

  test("first matching rule wins; default action applies to the rest") {
    import spark.implicits._
    val df = mk(1L -> """{"k":"a"}""", 2L -> """{"k":"b"}""", 3L -> """{"k":"c"}""")
    val out = WardenFilter(df, Seq(
      "k = a ; drop",
      "k = a ; pass", // unreachable: first match wins
      "k = b ; pass",
      "; drop"))
      .select($"event_id").as[Long].collect().toSet
    assert(out === Set(2L))
  }

  test("AND requires every clause; OR any clause") {
    import spark.implicits._
    val df = mk(
      1L -> """{"a":"1","b":"2"}""",
      2L -> """{"a":"1","b":"9"}""",
      3L -> """{"a":"9","b":"2"}""")
    val and = WardenFilter(df, Seq("a = 1 AND b = 2 ; pass", "; drop"))
      .select($"event_id").as[Long].collect().toSet
    assert(and === Set(1L))
    val or = WardenFilter(df, Seq("a = 1 OR b = 2 ; pass", "; drop"))
      .select($"event_id").as[Long].collect().toSet
    assert(or === Set(1L, 2L, 3L))
  }

  test("AND and OR cannot be mixed in one rule") {
    intercept[IllegalArgumentException] {
      WardenFilter.parseRules(Seq("a = 1 AND b = 2 OR c = 3 ; pass"))
    }
  }

  test("sample N keeps every Nth matching row in arrival order, deterministically") {
    import spark.implicits._
    val df = mk((1L to 10L).map(i => i -> s"""{"k":"s"}"""): _*)
    val out = WardenFilter(df, Seq("k = s ; sample 3", "; drop"))
      .select($"event_id").as[Long].collect().sorted
    assert(out.toSeq === Seq(3L, 6L, 9L)) // occurrence index % 3 == 0
    // same input, same result — the sampler is a counter, not a coin
    val again = WardenFilter(df, Seq("k = s ; sample 3", "; drop"))
      .select($"event_id").as[Long].collect().sorted
    assert(again.toSeq === out.toSeq)
  }

  test("default action defaults to pass when no trailing rule is given") {
    import spark.implicits._
    val df = mk(1L -> """{"k":"z"}""")
    val out = WardenFilter(df, Seq("k = nope ; drop"))
      .select($"event_id").as[Long].collect().toSet
    assert(out === Set(1L))
  }
}
