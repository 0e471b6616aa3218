package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deduplication — the downstream contract of the reference's at-least-once
 * delivery (README "Important Notice": retries can duplicate events;
 * distinct-value guarantees belong to the downstream pipeline — i.e., here).
 *
 * Scale notes: `exact` is a hash aggregate over all columns (one shuffle,
 * map-side combine). `latestByKey` shuffles once on the key and keeps O(1)
 * state per key. The streaming variant (graft.streaming.EventStream) bounds
 * state with a watermark TTL.
 */
object Dedup {

  /** Exact whole-row dedup: `SELECT DISTINCT *`. */
  def exact(df: DataFrame): DataFrame = df.distinct()

  /** Exact dedup by key columns — nondeterministic survivor, matching
    * `dropDuplicates` semantics. Prefer [[latestByKey]] when the survivor
    * must be reproducible. */
  def byKey(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /**
   * Deterministic keyed dedup: keep the row that sorts LAST by `ordering`
   * within each key group (e.g. latest timestamp, highest id). One shuffle
   * on `keys`; per-group state is a single row.
   */
  def latestByKey(df: DataFrame, keys: Seq[String], ordering: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
