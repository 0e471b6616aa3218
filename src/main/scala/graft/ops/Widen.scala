package graft.ops

import org.apache.spark.sql.DataFrame

/**
 * Scale-adaptive scan widening for CPU-dense per-row pipelines
 * (optimization round 20, guide §2.2/§2.5 "make partitioning
 * scale-adaptive rather than a constant").
 *
 * The driver's parquet tables are single files with ONE row group, so a
 * scan produces ONE input partition regardless of `local[N]` — and every
 * scan-rooted narrow chain (tokenize → shingle → winnow → regex gates,
 * the dominant compute of the text operators) runs single-threaded while
 * 31 cores idle. Measured on q195_span_extents: 3.4 s narrow → 1.6 s
 * after a round-robin widen; q211's profile showed ~8 s of consecutive
 * 1-task jobs of 0.6–1.0 s each.
 *
 * `scan(df)` round-robin-repartitions to the session default parallelism
 * ONLY when the frame's physical partitioning is narrower — so at real
 * scale (a 100 TB table scans as tens of thousands of splits) it is a
 * provable no-op and no corpus bytes ever shuffle; on the single-split
 * local layout it moves the few MB once and unlocks the full core count
 * for everything downstream.
 *
 * Contract: call it on RAW-SCAN lineage only (a `Tables.x(...)` frame,
 * optionally filtered/projected). Reading `rdd.getNumPartitions` on a
 * frame with pending shuffles would force AQE to execute those stages
 * just to answer the question — scan-only lineage has no stages, so the
 * probe is free.
 *
 * Determinism: round-robin placement never changes row CONTENT, and
 * every cross-row reduction in this repo is order-free by the Det
 * contract (integer-scaled sums, min/max, hash sets); per-row float
 * folds are intra-row. The oracle gate re-verifies every touched query.
 */
object Widen {
  def scan(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
}
