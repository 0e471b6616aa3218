package graft.sources

import graft.ingest.Ingest
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

/**
 * Kafka source/sink builders (SURVEY.md §2.1 S3/S4): the reference's
 * producer/consumer configuration re-expressed as Spark Kafka options.
 * These compose the ALREADY-TESTED frame builders (Ingest.serialize /
 * withKafkaTopic) with the connector; the connector itself needs a
 * broker, so these builders are exercised to the options boundary in
 * tests and documented here against the reference's config:
 *
 *  - topic `sv-uploads-<topic>` (`server/forwarder/kafka.go:65`)
 *  - snappy compression (`server/forwarder/kafka.go:42`)
 *  - acks=1 / WaitForLocal (`server/forwarder/kafka.go:41`)
 *  - linger 1 ms, 1 MB batches (`server/app/app.go:96-97`)
 *  - 10 in-flight requests (`server/app/app.go:87`)
 *  - max message 1,000,000 bytes (`server/app/app.go:94`)
 *  - consumer from oldest offset (`testing/consumer.go:40`)
 */
object Kafka {

  /** The producer tuning the reference runs with, as kafka sink options. */
  val producerOptions: Map[String, String] = Map(
    "kafka.compression.type" -> "snappy",
    "kafka.acks" -> "1",
    "kafka.linger.ms" -> "1",
    "kafka.batch.size" -> "1000000",
    "kafka.max.in.flight.requests.per.connection" -> "10",
    "kafka.max.request.size" -> "1000000")

  /**
   * Build the Kafka-ready frame from an enriched envelope stream: one
   * row per event with `topic` = sv-uploads-<topic>, `key` = event id
   * (stable partitioning per event id), `value` = single-record Avro
   * datum — the exact wire format the reference produces
   * (`server/sender/kafka.go:102-137`).
   */
  def toKafkaFrame(enriched: DataFrame): DataFrame =
    Ingest.withKafkaTopic(enriched).select(
      col("kafka_topic").as("topic"),
      col("id").cast("binary").as("key"),
      Ingest.avroBytes.as("value"))

  /** Streaming writer wired with the reference's producer tuning.
    * `frame` must be a STREAMING DataFrame (batch frames go through
    * [[writeBatchTo]]); caller adds checkpoint + starts. */
  def writeStreamTo(frame: DataFrame, bootstrapServers: String): DataStreamWriter[Row] =
    producerOptions.foldLeft(
      frame.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrapServers)) {
      case (w, (k, v)) => w.option(k, v)
    }

  /** Batch writer (backfills/replays) with the same producer tuning. */
  def writeBatchTo(frame: DataFrame, bootstrapServers: String): org.apache.spark.sql.DataFrameWriter[Row] =
    producerOptions.foldLeft(
      frame.write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrapServers)) {
      case (w, (k, v)) => w.option(k, v)
    }

  /** Streaming reader for the reference's consumer shape: earliest
    * offsets on the prefixed topic (testing/consumer.go:32-56). */
  def readStreamFrom(spark: SparkSession, bootstrapServers: String,
      topic: String): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", s"sv-uploads-$topic")
      .option("startingOffsets", "earliest")
      .load()
}
