package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Keyed prefix rank / running sums WITHOUT a per-key window — the
 * 100 TB-safe replacement for
 * `row_number().over(Window.partitionBy(group).orderBy(key))`.
 *
 * A window partitioned by a low-cardinality group column sends EVERY row
 * of a group to ONE task: a pretraining mix has a handful of sources, so
 * at corpus scale the largest source (possibly tens of TB) is sorted and
 * prefix-summed on a single executor core. This operator computes the
 * identical rank and running sums with bounded task sizes:
 *
 *  1. Each row gets a deterministic range BUCKET from its order key:
 *     `bucket = ⌊key·B / keyBound⌋`. The key is a uniform rolling hash in
 *     `[0, keyBound)` at every call site, so buckets are balanced, and —
 *     unlike `repartitionByRange`, whose sampled boundaries can differ
 *     between executions of the same plan — the bucket is a PURE FUNCTION
 *     of the row: re-execution under AQE, stage retry or speculative
 *     tasks can never disagree about a row's bucket, so the two passes
 *     below need no exchange-reuse guarantee to be consistent.
 *  2. A window partitioned by (bucket, group) computes the LOCAL rank and
 *     running sums. Max task size is ~|largest group| / B, not |largest
 *     group|; B defaults to `spark.sql.shuffle.partitions`.
 *  3. A partial-agg `groupBy(bucket, group)` reduces the corpus to
 *     ≤ B·|groups| one-row cell totals (map-side combined — the shuffle
 *     carries cells, not rows); an exclusive prefix sum over that TINY
 *     cell table (per group, in bucket order) yields each cell's offsets,
 *     which broadcast-join back and add locally.
 *
 * Global rank within a group = local rank + count of same-group rows in
 * lower buckets: exact because the bucket function is monotone in the key
 * (equal keys share a bucket; lower keys never land in higher buckets).
 * Cost: two column-pruned scans of the input (cell totals + the ranked
 * pass) and ONE full shuffle — at scale two scans are far cheaper than a
 * single-task sort of the largest group.
 *
 * Determinism contract: (key, tieBreaker) must totally order each group
 * (the call sites use a content hash tie-broken by doc_id); the key must
 * be non-null and in `[0, keyBound)` — violations `raise_error` rather
 * than silently mis-bucketing — and `keyBound · B ≤ 2^52` so the bucket
 * arithmetic is exact in integer-valued doubles.
 */
object PrefixRank {

  /** Exact integral division of a non-negative long column by a positive
    * constant: (x − x mod d) is an exact multiple of d, so for values
    * ≤ 2^52 the IEEE double quotient is exact (the Column DSL's `/` is
    * double division; SQL's `div` has no DSL form). */
  private def intDiv(x: Column, d: Long): Column =
    ((x - pmod(x, lit(d))) / lit(d)).cast("long")

  private val KEY = "__graft_key"
  private val TIE = "__graft_tie"
  private val BKT = "__graft_bkt"
  private val BKT2 = "__graft_bkt2"

  /**
   * Rank (1-based, dense-free `row_number` semantics under a total order)
   * and inclusive running sums per group, ordered by (orderKey,
   * tieBreaker) — appended to `df`'s columns as `rankName` (LongType) and
   * one column per `(input, outputName)` in `sums`.
   *
   * `groupCols` may be empty (global rank — the epoch-shuffle shape).
   * Null group values form their own group (null-safe join), matching
   * `Window.partitionBy` semantics. Sum INPUTS must be non-null
   * (coalesce at the call site): `sum() OVER` skips nulls, but a cell
   * whose entire prefix is null folds to NULL locally and NULL + offset
   * stays NULL — where a window would carry the earlier cells' offset.
   */
  def keyedPrefix(
      df: DataFrame,
      groupCols: Seq[String],
      orderKey: Column,
      keyBound: Long,
      tieBreaker: Column,
      sums: Seq[(Column, String)] = Nil,
      rankName: String = "rnk",
      buckets: Int = 0): DataFrame = {
    val b =
      if (buckets > 0) buckets
      else df.sparkSession.sessionState.conf.numShufflePartitions
    require(keyBound > 0 && b.toLong * keyBound <= (1L << 52),
      s"keyBound·buckets must stay exact in doubles (got $keyBound × $b)")
    require(!df.columns.exists(_.startsWith("__graft_")),
      "input already carries __graft_ working columns (nested keyedPrefix " +
        "over its own temporaries would silently overwrite them)")

    val svNames = sums.indices.map(i => s"__graft_sv_$i")
    val lsNames = sums.indices.map(i => s"__graft_lsm_$i")
    val totNames = sums.indices.map(i => s"__graft_tot_$i")
    val offNames = sums.indices.map(i => s"__graft_off_$i")
    val grpAlias = groupCols.indices.map(i => s"__graft_grp_$i")

    // Materialize key/tie/sum inputs once; mis-ranged keys fail loudly
    // (a null key would bucket to null and silently DROP the row at the
    // offsets join — a rank operator must never lose rows).
    var d = df.withColumn(KEY, orderKey).withColumn(TIE, tieBreaker)
    d = svNames.zip(sums).foldLeft(d) { case (acc, (nm, (c, _))) =>
      acc.withColumn(nm, c)
    }
    d = d.withColumn(BKT,
      when(col(KEY).isNotNull && col(KEY) >= 0 && col(KEY) < keyBound,
        intDiv(col(KEY) * b, keyBound))
        .otherwise(raise_error(concat(
          lit(s"prefixRank: order key outside [0, $keyBound): "),
          coalesce(col(KEY).cast("string"), lit("null"))))))

    // Pass 1 — local rank / running sums within each (bucket, group) cell.
    // Bucket leads the partition spec, so no window over the corpus is
    // ever keyed on the group alone (PlanSpec pins the spec shape).
    val cellW = Window.partitionBy((col(BKT) +: groupCols.map(col)): _*)
      .orderBy(col(KEY), col(TIE))
    val run = cellW.rowsBetween(Window.unboundedPreceding, 0)
    var local = d.withColumn("__graft_lrk", row_number().over(cellW).cast("long"))
    local = lsNames.zip(svNames).foldLeft(local) { case (acc, (ls, sv)) =>
      acc.withColumn(ls, sum(col(sv)).over(run))
    }

    // Pass 2 — per-cell totals (map-side combined partial agg; the
    // shuffle carries ≤ B·|groups| one-row cells) → exclusive prefix
    // offsets per group in bucket order. The offsets window runs over the
    // cell table only, and its group columns are renamed so the spec
    // shape stays distinguishable from a corpus window.
    val aggExprs = count(lit(1)).cast("long").as("__graft_cnt") +:
      totNames.zip(svNames).map { case (tot, sv) => sum(col(sv)).as(tot) }
    val cells = d.groupBy((col(BKT) +: groupCols.map(col)): _*)
      .agg(aggExprs.head, aggExprs.tail: _*)
      .select(col(BKT).as(BKT2) +:
        (groupCols.zip(grpAlias).map { case (g, a) => col(g).as(a) } ++
          ("__graft_cnt" +: totNames.toList).map(col)): _*)
    val offW = Window.partitionBy(grpAlias.map(col): _*).orderBy(col(BKT2))
      .rowsBetween(Window.unboundedPreceding, -1)
    var off = cells.withColumn("__graft_off_rk",
      coalesce(sum(col("__graft_cnt")).over(offW), lit(0L)))
    off = offNames.zip(totNames).foldLeft(off) { case (acc, (o, tot)) =>
      acc.withColumn(o, coalesce(sum(col(tot)).over(offW), lit(0L)))
    }
    val offSel = off.select((col(BKT2) +: (grpAlias.map(col)
      ++ ("__graft_off_rk" +: offNames.toList).map(col))): _*)

    // Broadcast offsets back on (bucket, group) — null-safe on the group
    // so a null group ranks as its own partition, like Window.partitionBy.
    val cond = groupCols.zip(grpAlias).foldLeft(col(BKT) === col(BKT2)) {
      case (c, (g, a)) => c && (col(g) <=> col(a))
    }
    var res = local.join(broadcast(offSel), cond)
      .withColumn(rankName, col("__graft_lrk") + col("__graft_off_rk"))
    res = sums.map(_._2).zip(lsNames.zip(offNames)).foldLeft(res) {
      case (acc, (out, (ls, o))) => acc.withColumn(out, col(ls) + col(o))
    }
    val temps = Seq(KEY, TIE, BKT, BKT2, "__graft_lrk", "__graft_cnt",
      "__graft_off_rk") ++ svNames ++ lsNames ++ totNames ++ offNames ++ grpAlias
    res.drop(temps: _*)
  }
}
