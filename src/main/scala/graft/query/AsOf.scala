package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (sorted-boundary) joins, the relational restatement of the
  * reference's binary searches over sorted range tables: IANA IPv4 block
  * lookup (`modules/whois.py:179–218`) and ASN→RIR assignment
  * (`modules/whois.py:166–177,220–237`). A boundary table (start, payload...)
  * sorted by `start` assigns each fact key the LAST boundary with
  * `start <= key`.
  *
  * Implementation: close each boundary's half-open interval with the next
  * boundary's start (a lead window over the SMALL boundary side only — never
  * a window over the fact table), then a broadcast range join
  * `key >= start AND key < next_start`. The fact side streams map-only; at
  * 100 TB there is no shuffle of the facts at all.
  */
object AsOf {

  /** `facts` joined to its governing boundary row. `boundaries` must be
    * small (broadcast side) with a `start` column; every other boundary
    * column is carried through. Keys below the first boundary drop out
    * (inner semantics, matching the reference's "not found" path).
    */
  def asOfJoin(facts: DataFrame, keyCol: String, boundaries: DataFrame): DataFrame = {
    val closed = boundaries.withColumn("next_start",
      lead(col("start"), 1, Long.MaxValue).over(Window.orderBy(col("start"))))
    facts.join(broadcast(closed),
        col(keyCol) >= col("start") && col(keyCol) < col("next_start"))
      .drop("next_start")
  }
}
