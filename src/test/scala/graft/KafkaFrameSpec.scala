package graft

import graft.ingest.Ingest
import graft.sources.Kafka
import org.apache.spark.sql.functions._

/** S3 — the Kafka-ready frame: (topic, key, value-as-Avro) built from
  * the envelope, with the reference's routing and wire format. The
  * connector itself needs a broker; the frame and options are the
  * testable boundary. */
class KafkaFrameSpec extends SparkSpec {
  import spark.implicits._

  test("toKafkaFrame produces routed, Avro-encoded, id-keyed rows") {
    val enriched = Ingest.enrichAt(
      Seq(("e1", "ev", "games-1", Map("k" -> "v"), 5L))
        .toDF("id", "name", "topic", "props", "clientTimestamp"), 99L)
      .withColumn("topic", lit("games-1"))
    val frame = Kafka.toKafkaFrame(enriched)
    assert(frame.columns.toSeq === Seq("topic", "key", "value"))
    val r = frame.head()
    assert(r.getString(0) === "sv-uploads-games-1")
    assert(new String(r.getAs[Array[Byte]](1), "UTF-8") === "e1")
    // the value decodes back through the envelope codec (wire-format proof)
    val decoded = Ingest.deserialize(frame.select("value"))
      .select("id", "name", "serverTimestamp", "clientTimestamp").head()
    assert(decoded.getString(0) === "e1")
    assert(decoded.getString(1) === "ev")
    assert(decoded.getLong(2) === 99L)
    assert(decoded.getLong(3) === 5L)
  }

  test("producer options carry the reference's tuning") {
    assert(Kafka.producerOptions("kafka.compression.type") === "snappy")
    assert(Kafka.producerOptions("kafka.acks") === "1")
    assert(Kafka.producerOptions("kafka.max.request.size") === "1000000")
  }
}
