package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /**
   * Batch append to a date-partitioned columnar table by path (S6 batch
   * analog). `format` selects the sink format — the reference notebook
   * lands Delta (`format("delta")`, ipynb cells 4–5); this sandbox's
   * `/opt/spark/jars` has no delta-spark jar, so parquet is the default
   * and Delta is one parameter away on a cluster that ships it.
   * `compression` picks the codec: snappy (default) for hot data, zstd
   * for the long cold tail — at 100 TB the codec choice is a double-digit
   * storage-percent decision per table.
   */
  def appendPartitioned(df: DataFrame, path: String,
      format: String = "parquet", compression: String = "snappy"): Unit =
    withDateParts(df)
      .write.mode("append")
      .partitionBy("year", "month", "day")
      .format(format)
      .option("compression", compression)
      .save(path)

  /**
   * Streaming append (S6): checkpointed, append-mode, partitioned — the
   * notebook's `writeStream ... toTable` restated against a path sink.
   * Returns the started query; callers own its lifecycle (B6 drain =
   * `processAllAvailable(); stop()`).
   */
  def streamAppend(df: DataFrame, path: String, checkpoint: String,
      format: String = "parquet") =
    withDateParts(df)
      .writeStream.outputMode("append")
      .format(format)
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy("year", "month", "day")
      .start()

  // ------------------------------------------------------------------
  // Catalog-table surface (S7 depth): the reference's query tail is a
  // Hive-metastore table over the landed files, repaired with
  // `msck repair table` so new date partitions become queryable
  // (reference hive/docker-compose.yml Presto section + README). The
  // Spark-native analogs: managed tables via saveAsTable / toTable, and
  // external tables over an existing path + catalog.recoverPartitions.
  // ------------------------------------------------------------------

  /** Batch append landing a partitioned CATALOG table (managed or
    * path-external via `option("path", ...)` upstream). Partitions are
    * tracked by the catalog as they land — no repair step needed. */
  def appendPartitionedTable(df: DataFrame, table: String,
      format: String = "parquet"): Unit =
    withDateParts(df)
      .write.mode("append")
      .partitionBy("year", "month", "day")
      .format(format)
      .saveAsTable(table)

  /** Streaming append to a catalog table — the notebook's literal
    * `writeStream ... toTable(...)` shape. */
  def streamAppendTable(df: DataFrame, table: String, checkpoint: String,
      format: String = "parquet") =
    withDateParts(df)
      .writeStream.outputMode("append")
      .format(format)
      .option("checkpointLocation", checkpoint)
      .partitionBy("year", "month", "day")
      .toTable(table)

  /**
   * Register an EXTERNAL partitioned table over files already landed by
   * [[appendPartitioned]], then discover its partitions — the
   * `msck repair table` analog (`spark.catalog.recoverPartitions`).
   * `like` supplies the data schema (partition columns year/month/day are
   * appended automatically); afterwards `spark.sql` queries against
   * `table` partition-prune exactly like path reads.
   */
  def registerExternalTable(spark: SparkSession, table: String, path: String,
      like: DataFrame): Unit = {
    val partCols = Seq("year", "month", "day")
    val dataDdl = withDateParts(like).schema.fields
      .filterNot(f => partCols.contains(f.name))
      .map(f => s"`${f.name}` ${f.dataType.sql}")
    val allDdl = (dataDdl ++ partCols.map(c => s"`$c` STRING")).mkString(", ")
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS `$table` ($allDdl)
         |USING PARQUET
         |PARTITIONED BY (year, month, day)
         |LOCATION '$path'""".stripMargin)
    spark.catalog.recoverPartitions(table)
  }
}
