package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * The reference's tier-3 landing pipeline (SURVEY.md §2.1 S5/S6, §2.2 T8/T9):
 * flatten the decoded struct, derive `year/month/day` date partitions from
 * the client timestamp, and append to a date-partitioned columnar table —
 * exactly what the reference notebook does
 * (`spark-notebook/eventsgateway-streaming.ipynb` cells 3–5).
 *
 * The `year/month/day` layout is the scale lever: at 100 TB, Catalyst's
 * partition pruning (`PruneFileSourcePartitions`) turns a date-bounded query
 * into a scan of just the matching directories. Everything downstream
 * (the flagship daily-counts query, retention-window deletes, backfills)
 * relies on it.
 */
object DatePartition {

  /**
   * T9 — derive the partition columns, byte-identical semantics to ipynb
   * cell 3: `date = to_date(from_unixtime(clientTimestamp/1000))`, then
   * `year/month/day = date_format(date, "yyyy"/"MM"/"dd")` (strings, as the
   * notebook produces — Hive-style partition values).
   */
  def withDateParts(df: DataFrame, tsCol: String = "clientTimestamp"): DataFrame = {
    val d = to_date(from_unixtime(col(tsCol) / 1000))
    df.withColumn("date", d)
      .withColumn("year", date_format(col("date"), "yyyy"))
      .withColumn("month", date_format(col("date"), "MM"))
      .withColumn("day", date_format(col("date"), "dd"))
  }

  /** Batch append to a date-partitioned parquet table (S6 batch analog). */
  def appendPartitioned(df: DataFrame, path: String): Unit =
    withDateParts(df)
      .write.mode("append")
      .partitionBy("year", "month", "day")
      .parquet(path)

  /**
   * Streaming append (S6): checkpointed, append-mode, partitioned — the
   * notebook's `writeStream ... toTable` restated against a path sink.
   * Returns the started query; callers own its lifecycle (B6 drain =
   * `processAllAvailable(); stop()`).
   */
  def streamAppend(df: DataFrame, path: String, checkpoint: String) =
    withDateParts(df)
      .writeStream.outputMode("append")
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy("year", "month", "day")
      .start()
}
