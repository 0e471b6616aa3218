package graft.model

import org.apache.spark.sql.types._

/**
 * Canonical event envelope of the engine.
 *
 * Mirrors the reference wire/storage model (see SURVEY.md §1):
 *  - wire protobuf `pb.Event` built at reference `client/client.go:231-240`
 *    (UUIDv4 id, name, string→string props, epoch-millis timestamp);
 *  - stored Avro record (reference notebook
 *    `spark-notebook/eventsgateway-streaming.ipynb` cell 1, field mapping
 *    `server/sender/kafka.go:102-109`): id, name, props (default {}),
 *    serverTimestamp, clientTimestamp — both epoch millis.
 *
 * `topic` is routing metadata only (selects the Kafka topic with the
 * `sv-uploads-` prefix, reference `server/forwarder/kafka.go:65`) and is NOT
 * part of the stored record, hence the separate [[IncomingEvent]].
 */
final case class Event(
    id: String,
    name: String,
    props: Map[String, String],
    serverTimestamp: Long,
    clientTimestamp: Long)

/** Event as accepted at the ingest edge: envelope + routing topic. */
final case class IncomingEvent(
    id: String,
    name: String,
    topic: String,
    props: Map[String, String],
    clientTimestamp: Long)

object EventSchema {

  /** Storage schema — the Avro record re-expressed as a Spark StructType. */
  val stored: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("props", MapType(StringType, StringType), nullable = false),
    StructField("serverTimestamp", LongType, nullable = false),
    StructField("clientTimestamp", LongType, nullable = false)))

  /** Ingest-edge schema: stored envelope minus serverTimestamp plus topic. */
  val incoming: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("topic", StringType, nullable = false),
    StructField("props", MapType(StringType, StringType), nullable = false),
    StructField("clientTimestamp", LongType, nullable = false)))

  /**
   * Avro schema of the stored record, byte-for-byte the semantics of the
   * reference notebook's inlined JSON schema (ipynb cell 1, namespace
   * com.tfgco.eventsgateway). Used with
   * `org.apache.spark.sql.avro.functions.{to_avro, from_avro}`.
   */
  val avroJson: String =
    """{"type":"record","name":"Event","namespace":"com.tfgco.eventsgateway",
      |"fields":[
      |{"name":"id","type":"string"},
      |{"name":"name","type":"string"},
      |{"name":"props","default":{},"type":{"type":"map","values":"string"}},
      |{"name":"serverTimestamp","type":"long"},
      |{"name":"clientTimestamp","type":"long"}]}""".stripMargin

  /** Kafka topic prefix applied by the reference forwarder
    * (`server/forwarder/kafka.go:65`). */
  val topicPrefix: String = "sv-uploads-"

  /** Default producer-side size cap in bytes
    * (`server/app/app.go:94` kafka.producer.maxMessageBytes). */
  val defaultMaxMessageBytes: Int = 1000000
}
