package graft.queries

import graft.ingest.Ingest
import graft.model.Tables
import graft.pipeline.DatePartition
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Ingest-surface queries (SURVEY.md §2.2 T2–T10, §2.1 S5/S7): the reference's
 * validate → enrich → Avro → date-partition dataflow, exercised end-to-end on
 * the driver `events` table and hash-checked against DuckDB.
 */
object IngestQueries {

  /**
   * The ingest-edge frame: the driver `events` table mapped onto the
   * reference envelope (Tables.eventsAsEnvelope) plus a deterministic
   * routing `topic`. Every 50th user routes to an empty topic so the T2
   * validation split is non-trivial and hash-checkable.
   */
  def incoming(spark: SparkSession, dir: String): DataFrame =
    // round-21: round-20's widen below the envelope decode regressed
    // every metrics consumer in the quiet-window sweep (q10 +0.22 s,
    // q12/q14/q46 +0.1 s each) — the from_json decode is too cheap at
    // this row size to repay the exchange. Narrow scan restored
    // (measured, OPTIMIZATION_r21.md).
    Tables.envelopeOf(Tables.events(spark, dir))
      .withColumn(
      "topic",
      when(col("user_id") % 50 === 0, lit(""))
        .otherwise(concat(lit("games-"), (col("user_id") % 4).cast("string"))))

  /** DuckDB mirror of [[incoming]] — prefixed to every oracle below. */
  val incomingSql: String =
    """WITH incoming AS (
      |  SELECT CAST(event_id AS VARCHAR) AS id,
      |         event_type AS name,
      |         CASE WHEN user_id % 50 = 0 THEN ''
      |              ELSE 'games-' || CAST(user_id % 4 AS VARCHAR) END AS topic,
      |         props,
      |         CAST(epoch_ms(ts) AS BIGINT) AS client_ts,
      |         ts, user_id, value
      |  FROM events),
      |valid AS (
      |  SELECT * FROM incoming
      |  WHERE id IS NOT NULL AND id <> '' AND topic IS NOT NULL AND topic <> ''
      |    AND name IS NOT NULL AND name <> ''
      |    AND client_ts IS NOT NULL AND client_ts <> 0)
      |""".stripMargin

  /** Spark mirror of the oracle's `valid` CTE (renames clientTimestamp). */
  def valid(spark: SparkSession, dir: String): DataFrame =
    Ingest.validate(incoming(spark, dir))
      .withColumnRenamed("clientTimestamp", "client_ts")

  // ---------------------------------------------------------------------
  // q01 — the flagship: daily event counts by name over the validated,
  // date-partitioned table. This is the query the reference's whole
  // year/month/day layout exists to serve (notebook cell 3 + Presto tail).
  // At scale the year/month/day groupBy keys are the partition keys, so the
  // aggregation is map-side-combinable and the scan partition-pruned.
  val q01 = Q(
    "q01_daily_counts",
    (s, d) => {
      val df = DatePartition.withDateParts(
        Ingest.validate(incoming(s, d)), "clientTimestamp")
      df.groupBy(col("year"), col("month"), col("day"), col("name"))
        .agg(count(lit(1)).as("n_events"))
        .orderBy("year", "month", "day", "name")
    },
    Some(incomingSql +
      """SELECT strftime(ts, '%Y') AS year, strftime(ts, '%m') AS month,
        |       strftime(ts, '%d') AS day, name, COUNT(*) AS n_events
        |FROM valid GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3, 4""".stripMargin))

  // q02 — T2 anti-filter: the rejected rows (reference returns
  // FailedPrecondition per missing field, server/sender/kafka.go:89-94).
  val q02 = Q(
    "q02_validate_rejects",
    (s, d) => Ingest.rejects(incoming(s, d))
      .select(col("id"), col("name"), col("user_id"))
      .orderBy(col("id").cast("bigint")),
    Some(incomingSql +
      """SELECT id, name, user_id FROM incoming
        |WHERE NOT (id IS NOT NULL AND id <> '' AND topic IS NOT NULL
        |  AND topic <> '' AND name IS NOT NULL AND name <> ''
        |  AND client_ts IS NOT NULL AND client_ts <> 0)
        |ORDER BY CAST(id AS BIGINT)""".stripMargin))

  // q03 — T4/T5/T6: enrich with a fixed serverTimestamp, serialize to a
  // single-record Avro datum and decode it back (the reference's own
  // round-trip invariant, server/app/server_test.go:110-167). The oracle is
  // the identity projection — a hash match proves the Avro codec preserved
  // every field.
  val fixedServerTs = 1704067200000L
  val q03 = Q(
    "q03_avro_roundtrip",
    (s, d) => {
      val enriched = Ingest.enrichAt(Ingest.validate(incoming(s, d)), fixedServerTs)
      Ingest.roundTrip(enriched)
        .select(col("id"), col("name"),
          element_at(col("props"), "k").as("prop_k"),
          col("serverTimestamp").as("server_ts"),
          col("clientTimestamp").as("client_ts"))
        .orderBy(col("id").cast("bigint"))
    },
    Some(incomingSql +
      s"""SELECT id, name, json_extract_string(props, '$$.k') AS prop_k,
         |       CAST($fixedServerTs AS BIGINT) AS server_ts, client_ts
         |FROM valid ORDER BY CAST(id AS BIGINT)""".stripMargin))

  // q04 — T3 size-limit predicate (server/sender/kafka.go:76-82), applied to
  // the payload bytes of `documents` (the avro-bytes variant is ScalaTest-
  // checked; octet_length is the SQL-expressible measure).
  val q04 = Q(
    "q04_size_limit",
    (s, d) => Tables.documents(s, d)
      .filter(octet_length(col("text")) < 250)
      .select(col("doc_id"), octet_length(col("text")).as("n_bytes"))
      .orderBy("doc_id"),
    Some(
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes FROM documents
        |WHERE octet_length(encode(text)) < 250 ORDER BY doc_id""".stripMargin))

  // q05 — T7 topic routing: the distinct Kafka topics the valid stream
  // fans out to (`"sv-uploads-" + topic`, server/forwarder/kafka.go:65).
  val q05 = Q(
    "q05_kafka_topics",
    (s, d) => Ingest.withKafkaTopic(Ingest.validate(incoming(s, d)))
      .select(col("kafka_topic")).distinct().orderBy("kafka_topic"),
    Some(incomingSql +
      """SELECT DISTINCT 'sv-uploads-' || topic AS kafka_topic
        |FROM valid ORDER BY kafka_topic""".stripMargin))

  // q06 — T10 props access: read a key out of the dynamic props map
  // (tests props["messageID"], client/sync_int_test.go:70-77) and aggregate
  // over it.
  val q06 = Q(
    "q06_props_access",
    (s, d) => incoming(s, d)
      .select(element_at(col("props"), "k").as("prop_k"), col("value"))
      .groupBy("prop_k")
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
      .orderBy("prop_k"),
    Some(incomingSql +
      s"""SELECT json_extract_string(props, '$$.k') AS prop_k, COUNT(*) AS n,
         |       ${Det.dsumSql("value")} AS sum_value
         |FROM incoming GROUP BY 1 ORDER BY 1""".stripMargin))

  // q07 — partition-pruned scan: a one-week date-bounded aggregate. On the
  // partitioned table this prunes to 7 of N day-directories
  // (Catalyst PruneFileSourcePartitions); semantics hash-checked here.
  val q07 = Q(
    "q07_partition_prune",
    (s, d) => {
      val df = DatePartition.withDateParts(
        Ingest.validate(incoming(s, d)), "clientTimestamp")
      df.filter(col("date").between("2024-01-08", "2024-01-14"))
        .groupBy("name")
        .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
        .orderBy("name")
    },
    Some(incomingSql +
      s"""SELECT name, COUNT(*) AS n, ${Det.dsumSql("value")} AS sum_value
         |FROM valid
        |WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-08' AND DATE '2024-01-14'
        |GROUP BY 1 ORDER BY 1""".stripMargin))

  val all: Vector[Q] = Vector(q01, q02, q03, q04, q05, q06, q07)
}
