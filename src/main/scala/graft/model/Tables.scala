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
   * The driver `events.parquet` has shipped `ts` in two physical layouts
   * across rounds: parquet TIMESTAMP(NANOS) (rounds ≤11 — Spark's
   * vectorized reader rejects it, so it is read as int64 nanos via the
   * legacy conf and rebuilt with integer `div`, lossless because the
   * sub-microsecond part is zero) and, from round 12, plain
   * TIMESTAMP(MICROS) without UTC adjustment, which Spark reads as
   * TIMESTAMP_NTZ. Normalize both to session-local TimestampType: every
   * session in this repo pins `spark.sql.session.timeZone=UTC`, so the
   * NTZ→LTZ cast interprets the stored wall-clock as the same UTC epoch
   * DuckDB's `epoch_ms(ts)` sees on the oracle side.
   */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
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
    envelopeOf(events(spark, dir))

  /** Envelope projection over an already-loaded events frame — split out
    * (round 20) so callers can widen the raw scan first
    * ([[graft.ops.Widen]]): the `from_json` props decode is the
    * envelope's dominant per-row cost and must sit ABOVE any widening
    * exchange to parallelize. */
  def envelopeOf(ev: DataFrame): DataFrame =
    ev.select(
      col("event_id").cast(StringType).as("id"),
      col("event_type").as("name"),
      from_json(col("props"), MapType(StringType, StringType)).as("props"),
      unix_millis(col("ts").cast("timestamp")).as("clientTimestamp"),
      col("user_id"),
      col("value"))
}
