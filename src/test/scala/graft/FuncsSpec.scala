package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import graft.functions.Funcs

/** Scalar-function edge cases (SURVEY §2.9): ip codec roundtrips over the
  * full 32-bit range, reserved-range boundaries, and next_step arithmetic.
  */
class FuncsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("ipstr2int(int2ipstr(x)) == x across the 32-bit range (property)") {
    import spark.implicits._
    val ips = Gen.listOfN(200, Gen.chooseNum(0L, 4294967295L)).sample.get
      .:+(0L).:+(4294967295L).:+(2147483648L) // boundaries
    val got = ips.toDF("ip")
      .select(col("ip"), Funcs.ipstr2int(Funcs.int2ipstr(col("ip"))).as("rt"))
      .as[(Long, Long)].collect()
    got.foreach { case (ip, rt) => assert(ip === rt, s"roundtrip broke at $ip") }
  }

  test("reserved ranges classify their boundaries and miss their neighbors") {
    import spark.implicits._
    val cases = Funcs.ReservedRanges.flatMap { case (name, lo, hi) =>
      Seq((lo, name), (hi, name)) ++
        (if (lo > 0) Seq((lo - 1, null: String)) else Nil)
    }.toMap // later entries may overwrite neighbors that fall in another range
    val got = cases.keys.toSeq.toDF("ip")
      .select(col("ip"), Funcs.reservedRange(col("ip")).as("cls"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    Funcs.ReservedRanges.foreach { case (name, lo, hi) =>
      assert(got(lo) == name && got(hi) == name, s"boundary of $name")
    }
  }

  test("nextStep yields the smallest base + k*step strictly above minimum") {
    import spark.implicits._
    val rows = Seq((0L, 13L, 7L), (0L, 14L, 7L), (100L, 100L, 10L), (5L, 3L, 4L))
    val got = rows.toDF("base", "minimum", "step")
      .select(Funcs.nextStep(col("base"), col("minimum"), col("step")).cast("long"))
      .as[Long].collect().toSeq
    assert(got === Seq(14L, 21L, 110L, 5L))
    got.zip(rows).foreach { case (ns, (b, m, st)) =>
      assert(ns > m && (ns - b) % st === 0)
    }
  }

  test("matchStr ignores case, separators, and surrounding space") {
    import spark.implicits._
    val got = Seq(("Zeu_S", "the zeus-malware family"), ("emotet", "EMO.TET rules"),
      ("agent", "nothing here")).toDF("needle", "hay")
      .select(Funcs.matchStr(col("needle"), col("hay")))
      .as[Boolean].collect().toSeq
    assert(got === Seq(true, true, false))
  }

  test("latest_k equals sort+slice on random data, including duplicates and k > n (property)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{call_function, collect_list, lit, slice, sort_array}
    graft.GraftExtensions.register(spark)
    // values drawn from a SMALL domain so boundary duplicates are common —
    // the case where a wrong tie-break would diverge from sort+slice
    val rows = Gen.listOfN(400, Gen.zip(Gen.chooseNum(0, 7), Gen.chooseNum(0L, 50L)))
      .sample.get
    val df = rows.toDF("g", "v").repartition(4)
    val k = 5
    val got = df.groupBy(col("g"))
      .agg(call_function("latest_k", col("v"), lit(k)).as("ring"))
    val want = df.groupBy(col("g"))
      .agg(org.apache.spark.sql.functions.expr(
        s"slice(sort_array(collect_list(v)), greatest(size(collect_list(v)) - ${k - 1}, 1), $k)")
        .as("ring"))
    val g = got.collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    val w = want.collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(g === w)
    // k larger than any group: every value comes back, ascending
    val all = df.groupBy(col("g"))
      .agg(call_function("latest_k", col("v"), lit(10000)).as("ring"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    val allWant = rows.groupBy(_._1).map { case (gk, vs) => gk -> vs.map(_._2).sorted }
    assert(all === allWant)
  }
}
