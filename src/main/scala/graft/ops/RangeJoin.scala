package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Point-in-interval (range) join — the second classic operator Spark's
 * equi-join surface lacks. Planned naively, `l.ts BETWEEN r.start AND
 * r.end` is a BroadcastNestedLoopJoin: O(|L|·|R|) comparisons.
 *
 * The scalable composition bins time: each right interval is EXPLODED
 * onto the fixed-width bins it covers, each left point is keyed by its
 * single bin, and the join becomes an equi-join on the bin id followed
 * by the exact containment filter. One shuffle on a long key; candidate
 * volume is |L| + Σ(interval_len/bin) instead of |L|·|R|. A left point
 * has exactly one bin, so a (point, interval) pair can match at most
 * once — no dedup step.
 *
 * Choose `binMs` near the typical interval length: wider bins inflate
 * candidates per bin, narrower bins inflate the right-side explosion
 * (an interval costs ceil(len/binMs)+1 rows).
 */
object RangeJoin {

  /** Join left rows (point `leftTs`) to right rows (interval
    * [`startCol`, `endCol`), end-exclusive). Output: left ⨝ right columns
    * for every containment match (inner join). */
  def pointInInterval(left: DataFrame, leftTs: String,
      right: DataFrame, startCol: String, endCol: String,
      binMs: Long): DataFrame = {
    val lb = left.withColumn("__bin",
      floor(unix_millis(col(leftTs)) / binMs).cast("long"))
    // end bin uses unix_millis(end) un-decremented: ms-truncation of a
    // sub-ms end could otherwise drop the last bin. Over-coverage only
    // adds candidates; the exact filter below removes them.
    val rb = right.withColumn("__bin",
      explode(sequence(
        floor(unix_millis(col(startCol)) / binMs).cast("long"),
        floor(unix_millis(col(endCol)) / binMs).cast("long"))))
    lb.join(rb, "__bin")
      .filter(col(leftTs) >= col(startCol) && col(leftTs) < col(endCol))
      .drop("__bin")
  }
}
