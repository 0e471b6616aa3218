package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

/**
 * Loaders for the driver-supplied parquet tables (TESTDATA.md). Column
 * selection stays declarative so Catalyst pushes projection and predicates
 * into the parquet scan — at 100 TB the scan is the dominant cost and
 * pruning is the first-order optimization.
 */
object Tables {

  def region(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/region.parquet")
  def nation(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/nation.parquet")
  def customer(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/customer.parquet")
  def supplier(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/supplier.parquet")
  def part(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/part.parquet")
  def orders(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/orders.parquet")
  def lineitem(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")
  /**
   * The driver `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS),
   * which Spark's vectorized reader rejects outright. Read the physical
   * int64 nanos via the legacy conf and rebuild a micros TimestampType
   * column (integer `div` — double division would lose precision on
   * epoch-nanos magnitudes). The sub-microsecond part of the driver data is
   * zero, so this conversion is lossless and DuckDB-comparable.
   */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  /**
   * The driver's `events.parquet` carries `props` as a JSON string; the
   * reference envelope carries a map<string,string> (SURVEY.md §1.4). This
   * bridges the two: decode to MapType and rename columns onto the envelope.
   *
   * `event_id` → `id` (stringified), `event_type` → `name`,
   * `ts` → `clientTimestamp` (epoch millis, as the reference stores:
   * `client/client.go:238` UnixNano()/1e6).
   */
  def eventsAsEnvelope(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).select(
      col("event_id").cast(StringType).as("id"),
      col("event_type").as("name"),
      from_json(col("props"), MapType(StringType, StringType)).as("props"),
      unix_millis(col("ts").cast("timestamp")).as("clientTimestamp"),
      col("user_id"),
      col("value"))
}
