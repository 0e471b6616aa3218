package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Key-salting for skewed shuffles (SURVEY.md §2.5 scale levers).
 *
 * When one join key dominates (the hot user, the null-bucket, the
 * default topic), a plain equi-join sends every matching row to ONE
 * reducer and the stage runs at the speed of its hottest task. AQE's
 * skew-join split handles the sort-merge case automatically, but not
 * every shape (e.g. when the skewed side feeds a co-partitioned
 * downstream agg, or on engines/configs without AQE) — salting is the
 * explicit, always-available lever.
 */
object Salted {

  /**
   * Skew-safe equi-join: the large side's rows are salted into `nSalts`
   * sub-keys by `saltExpr` (any roughly-uniform deterministic per-row
   * expression — an id column, NOT the join key); the small side is
   * replicated across all salt values; the join runs on (key, salt), so
   * a hot key's rows spread over `nSalts` reducers. Result is row-for-row
   * identical to `large.join(small, key)` — the salt never reaches the
   * output. Cost: small side shuffled/broadcast nSalts×.
   */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      saltExpr: Column, nSalts: Int = 16): DataFrame = {
    // A NULL saltExpr would make pmod NULL and silently drop the row from
    // the equi-join — land NULLs in bucket 0 so the identity claim holds.
    val salted = large.withColumn("__salt",
      coalesce(pmod(saltExpr, lit(nSalts.toLong)), lit(0L)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(nSalts.toLong - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
