package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of (temporal) join — the canonical operator Spark's join surface
 * lacks: attach to each left row the MOST RECENT right row for the same
 * key with `right.ts <= left.ts` (the "price as of the trade", "user
 * state as of the event" lookup).
 *
 * A naive formulation is a non-equi join (planned as a nested-loop —
 * quadratic per key) or a per-left-row subquery. This implementation is
 * the scalable composition: tag and UNION both sides, then one window
 * pass per key ordered by (ts, tag) carrying `last(payload, ignoreNulls)`
 * — right rows sort before left rows at equal timestamps, so `<=`
 * semantics fall out of the sort order. ONE shuffle on the key, O(1)
 * running state per partition, left rows with no prior right row keep a
 * NULL payload (left-join semantics).
 *
 * Requirement: `right` must be unique per (key, ts) — otherwise the
 * match among same-timestamp right rows is tie-ambiguous. Pre-dedupe
 * with [[Dedup.latestByKey]] (as q64 does).
 */
object AsOfJoin {

  /**
   * @param left     probe side; ALL its columns pass through
   * @param right    build side; all non-key columns (including its ts)
   *                 become fields of the `asof` struct column
   * @param key      equi-join key column name (same name both sides)
   * @param leftTs   left event-time column name
   * @param rightTs  right event-time column name
   */
  def asof(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String): DataFrame = {
    val payloadCols = right.columns.filterNot(_ == key)
    val payloadType = org.apache.spark.sql.types.StructType(
      right.schema.fields.filterNot(_.name == key))
    val leftType = org.apache.spark.sql.types.StructType(left.schema.fields)

    val r = right.select(col(key), col(rightTs).as("__ts"),
      lit(0).as("__tag"),
      struct(payloadCols.map(col): _*).as("__p"),
      lit(null).cast(leftType).as("__l"))
    val l = left.select(col(key), col(leftTs).as("__ts"),
      lit(1).as("__tag"),
      lit(null).cast(payloadType).as("__p"),
      struct(left.columns.map(col): _*).as("__l"))

    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    r.unionAll(l)
      .withColumn("__match", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(col("__l.*") +: Seq(col("__match").as("asof")): _*)
  }
}
