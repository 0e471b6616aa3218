package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton-curve) data layout: interleave the bits of two
 * dimension keys so that range-partitioning plus within-partition
 * sorting on the single z-value clusters BOTH dimensions at once —
 * every written file then covers a narrow rectangle of (x, y) space,
 * and parquet min/max footer pruning works for filters on EITHER
 * column. This is the layout pass Delta/Iceberg expose as
 * `OPTIMIZE ... ZORDER BY`; here it is plain
 * `repartitionByRange + sortWithinPartitions`, usable with the stock
 * parquet writer (composes with DatePartition's partitioned-append
 * landing).
 *
 * Scale shape: the z-value is a scan-stage bitwise expression
 * (codegen'd; no shuffle of its own), and the layout pass is the ONE
 * range shuffle any clustered rewrite needs. Linear-scaling contrast
 * with a single-column sort: sorting by x alone leaves the y min/max
 * of every file spanning the whole domain, so y-filters prune nothing
 * — PipelineSpec pins the difference.
 */
object ZOrder {

  /**
   * Morton interleave of the low `bits` bits of `x` (even bit
   * positions) and `y` (odd positions), both taken mod 2^bits — a
   * LongType column in [0, 4^bits). Callers pick `bits` to cover their
   * key cardinality; beyond-range keys wrap (pmod), which degrades
   * clustering for the wrapped tail but never correctness.
   */
  def zvalue(x: Column, y: Column, bits: Int = 16): Column =
    zvalueN(Seq(x, y), bits)

  /**
   * k-dimensional Morton interleave: dimension j of `dims` occupies bit
   * positions i·k + j — a LongType column in [0, 2^(bits·k)). The
   * product bits·k must stay below 63 (the long sign bit); beyond-range
   * keys wrap per dimension (pmod), degrading clustering for the
   * wrapped tail but never correctness.
   */
  def zvalueN(dims: Seq[Column], bits: Int): Column = {
    val k = dims.size
    require(k >= 1, "at least one dimension")
    require(bits >= 1 && bits * k <= 62, s"bits*$k must be in [1, 62]")
    val ms = dims.map(d => pmod(d.cast("long"), lit(1L << bits)))
    (0 until bits).flatMap { i =>
      ms.zipWithIndex.map { case (m, j) =>
        shiftleft(shiftright(m, i).bitwiseAND(lit(1L)), i * k + j)
      }
    }.reduce(_ bitwiseOR _)
  }

  /**
   * Rewrite `df` into `numFiles` z-clustered range partitions on
   * (x, y) — write the result with the plain parquet writer and each
   * output file's footer carries tight min/max on both dimensions.
   * `repartitionByRange` samples the z distribution, so skewed keys
   * still land in balanced files.
   */
  def zorderBy(df: DataFrame, x: Column, y: Column, bits: Int = 16,
      numFiles: Int = 64): DataFrame =
    zorderByN(df, Seq(x, y), bits, numFiles)

  /** k-dimensional [[zorderBy]] over [[zvalueN]]'s key. */
  def zorderByN(df: DataFrame, dims: Seq[Column], bits: Int,
      numFiles: Int): DataFrame = {
    val z = zvalueN(dims, bits)
    df.repartitionByRange(numFiles, z).sortWithinPartitions(z)
  }
}
