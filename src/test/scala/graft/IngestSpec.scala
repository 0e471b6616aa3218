package graft

import graft.ingest.Ingest
import graft.model.EventSchema
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/**
 * Ingest-edge operator specs, mirroring the reference's server tests:
 * per-field validation rejections (server/app/server_test.go:51-108),
 * the Avro round-trip invariant (server_test.go:110-167), and the
 * size-limit rejection (server_test.go:168-200).
 */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  private def envelope(id: String = "e1", name: String = "ev",
      topic: String = "t", ts: Long = 1704067200000L,
      props: Map[String, String] = Map("k" -> "v")) =
    Seq((id, name, topic, props, ts))
      .toDF("id", "name", "topic", "props", "clientTimestamp")

  test("T1 construct stamps UUIDv4 ids and now-ish epoch-millis timestamps") {
    val before = System.currentTimeMillis()
    val out = Ingest.construct(
      Seq(1, 2, 3).toDF("seed"), name = "ev", topic = "t")
      .select("id", "name", "topic", "clientTimestamp").collect()
    val after = System.currentTimeMillis()
    assert(out.length === 3)
    val uuidRe = "[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}".r
    for (r <- out) {
      assert(uuidRe.matches(r.getString(0)), s"not a UUIDv4: ${r.getString(0)}")
      assert(r.getString(1) === "ev" && r.getString(2) === "t")
      assert(r.getLong(3) >= before - 1000 && r.getLong(3) <= after + 1000)
    }
    assert(out.map(_.getString(0)).distinct.length === 3) // ids unique
  }

  test("T2 validation accepts a fully-populated event") {
    assert(Ingest.validate(envelope()).count() === 1)
    assert(Ingest.rejects(envelope()).count() === 0)
  }

  test("T2 validation rejects each individually-missing field") {
    for (bad <- Seq(
        envelope(id = ""), envelope(name = ""),
        envelope(topic = ""), envelope(ts = 0L))) {
      assert(Ingest.validate(bad).count() === 0)
      assert(Ingest.rejects(bad).count() === 1)
    }
  }

  test("T5/T6 Avro round-trip preserves every envelope field (property)") {
    val propsGen = Gen.mapOf(Gen.zip(
      Gen.alphaNumStr.suchThat(_.nonEmpty), Gen.oneOf(
        Gen.alphaNumStr, Gen.const("ünïcode-✓"), Gen.const(""))))
    val caseGen = Gen.zip(
      Gen.alphaNumStr.suchThat(_.nonEmpty), propsGen,
      Gen.chooseNum(1L, 4102444800000L))
    // deterministic sample of generated cases + the hand-picked edges
    val sampled = (0 until 20).flatMap(i =>
      caseGen.apply(Gen.Parameters.default, Seed(42L + i)))
    val cases = sampled ++ Seq(
      ("edge", Map.empty[String, String], 1L),
      ("edge", Map("üñï" -> "✓-value", "" + 'é' -> ""), 253402300799000L))
    for ((name, props, ts) <- cases) {
      val in = Ingest.enrichAt(
        envelope(name = name, props = props, ts = ts), 1704067200123L)
      val r = Ingest.roundTrip(in)
        .select("id", "name", "props", "serverTimestamp", "clientTimestamp")
        .head()
      assert(r.getString(0) === "e1")
      assert(r.getString(1) === name)
      assert(r.getMap[String, String](2).toMap === props)
      assert(r.getLong(3) === 1704067200123L)
      assert(r.getLong(4) === ts)
    }
  }

  test("T3 size limit drops oversized payloads at the Avro-bytes boundary") {
    // one 30001-'a' prop vs maxMessageBytes=30000, as in the reference
    // test config (server/config/test.yaml, server_test.go:168-200)
    val big = envelope(props = Map("p" -> ("a" * 30001)))
    val small = envelope(props = Map("p" -> "a"))
    val enrich = (df: org.apache.spark.sql.DataFrame) => Ingest.enrichAt(df, 1L)
    assert(Ingest.sizeLimit(enrich(big), maxBytes = 30000).count() === 0)
    assert(Ingest.sizeLimit(enrich(small), maxBytes = 30000).count() === 1)
  }

  test("T7 Kafka topic routing prefixes sv-uploads-") {
    val Row(t: String) = Ingest.withKafkaTopic(envelope())
      .select("kafka_topic").head()
    assert(t === "sv-uploads-t")
    assert(EventSchema.topicPrefix === "sv-uploads-")
  }
}
