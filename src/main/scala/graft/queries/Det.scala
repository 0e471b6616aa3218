package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Order-independent floating aggregates for hash-checked oracles.
 *
 * A plain `ROUND(SUM(double), 2)` is order-nondeterministic: Spark folds
 * partials in partition/merge order while DuckDB folds sequentially, and
 * double addition does not reassociate — a group landing on a round-half
 * boundary hashes differently (this broke q46/q47 in round 2). The fix is
 * to make the checked sum exact and order-free: scale each element to
 * integer units first (`floor(x * 10^dp + 0.5)` — exact for inputs with
 * ≤ dp decimals, deterministic per-row otherwise), sum as BIGINT (integer
 * addition is associative), and render back with one exact IEEE division.
 *
 * Both sides compute the identical per-row scaling and the identical final
 * division, so results are bit-equal regardless of fold order. The BIGINT
 * sum is exact as long as total scaled units < 2^63 (at 100 TB, ~1e16
 * cents — far inside range); the rendered double is exact below 2^53
 * units and within 1 ULP above, identically on both engines.
 */
object Det {

  private def scaleOf(dp: Int): Double = math.pow(10, dp).round.toDouble
  private def scaleSql(dp: Int): String = "1" + ("0" * dp) + ".0"

  /** Exact order-free sum of a double expression at `dp` decimal places.
    * Spark `floor(double)` already yields LONG; the sum is integer. */
  def dsum(c: Column, dp: Int = 2): Column = {
    val sc = scaleOf(dp)
    sum(floor(c * sc + lit(0.5))) / lit(sc)
  }

  /** DuckDB mirror of [[dsum]]. `FLOOR` returns DOUBLE there, but the value
    * is integer-valued so `CAST AS BIGINT` is exact (no round-vs-truncate
    * divergence). The sum is CAST to DOUBLE before the scale division
    * because these SQL strings also run through `spark.sql` (q75): Spark
    * parses the literal `100.0` as DECIMAL(4,1), and `BIGINT / DECIMAL`
    * there produces a DECIMAL(27,6) column that the driver hashes
    * differently from DuckDB's DOUBLE even when every value is equal.
    * `DOUBLE / DECIMAL` is plain double division on both engines, and
    * HUGEINT/BIGINT→DOUBLE is exact below 2^53 units. */
  def dsumSql(e: String, dp: Int = 2): String =
    s"CAST(SUM(CAST(FLOOR(($e) * ${scaleSql(dp)} + 0.5) AS BIGINT)) AS DOUBLE) / ${scaleSql(dp)}"

  /** Order-free mean: exact scaled sum, then `/ count / scale` — two IEEE
    * divisions performed in the same order on both engines. */
  def davg(c: Column, dp: Int): Column = {
    val sc = scaleOf(dp)
    sum(floor(c * sc + lit(0.5))) / count(lit(1)) / lit(sc)
  }

  /** DuckDB mirror of [[davg]] (left-associative, same division order;
    * CAST AS DOUBLE for the same Spark-decimal reason as [[dsumSql]]). */
  def davgSql(e: String, dp: Int): String =
    s"CAST(SUM(CAST(FLOOR(($e) * ${scaleSql(dp)} + 0.5) AS BIGINT)) AS DOUBLE) / COUNT(*) / ${scaleSql(dp)}"

  /** Deterministic scalar rounding — see TextFunctions.fround: engine
    * `round()` differs across engines exactly at half boundaries (Spark
    * decimal HALF_UP vs DuckDB half-to-even on the scaled double); this
    * explicit floor form is identical IEEE arithmetic on both. */
  def fr(c: Column, dp: Int): Column = {
    val sc = scaleOf(dp)
    floor(c * sc + lit(0.5)) / lit(sc)
  }

  /** DuckDB mirror of [[fr]] (CAST AS DOUBLE: DuckDB FLOOR is already
    * DOUBLE so the cast is a no-op there, but Spark FLOOR yields BIGINT
    * and `BIGINT / DECIMAL-literal` would go decimal — see [[dsumSql]]). */
  def frSql(e: String, dp: Int): String =
    s"CAST(FLOOR(($e) * ${scaleSql(dp)} + 0.5) AS DOUBLE) / ${scaleSql(dp)}"
}
