package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Column profiling — the data-quality summary pass (row counts, null
 * rates, distinct cardinalities, value ranges) every pipeline runs
 * before trusting a new drop of data.
 *
 * ONE aggregation pass computes every statistic for every requested
 * column (Catalyst plans multi-distinct via Expand — still a single
 * scan), and the 1-row result is reshaped to per-column rows with
 * `stack` — so profiling N columns of a 100 TB table costs one scan,
 * not N. Min/max are the stored values untouched (no cross-engine
 * formatting), which keeps the output oracle-comparable.
 */
object Profile {

  /** Profile numeric columns: one output row per column with
    * (col_name, n_rows, n_null, n_distinct, vmin, vmax).
    *
    * `approx = false` (the oracle-checked default) counts distincts
    * exactly: Catalyst plans the multi-distinct via Expand, multiplying
    * every row ×N columns before the shuffle — fine to ~1e9 rows, the
    * wrong trade at 100 TB. `approx = true` swaps in HLL
    * `approx_count_distinct` (±~2.3% standard error): no Expand, no
    * per-value shuffle state, a single partial-aggregate pass — the
    * plan profiling should have at full scale. */
  def numeric(df: DataFrame, cols: Seq[String],
      approx: Boolean = false): DataFrame = {
    def nd(c: String) =
      if (approx) approx_count_distinct(col(c)) else countDistinct(col(c))
    val aggs = cols.flatMap(c => Seq(
      count(lit(1)).as(s"__n_$c"),
      (count(lit(1)) - count(col(c))).as(s"__nn_$c"),
      nd(c).as(s"__nd_$c"),
      min(col(c)).cast("double").as(s"__mn_$c"),
      max(col(c)).cast("double").as(s"__mx_$c")))
    val stacked = cols.map(c =>
      s"'$c', `__n_$c`, `__nn_$c`, `__nd_$c`, `__mn_$c`, `__mx_$c`")
      .mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${cols.length}, $stacked) AS " +
        "(col_name, n_rows, n_null, n_distinct, vmin, vmax)"))
      .orderBy("col_name")
  }
}
