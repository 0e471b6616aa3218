package graft

import graft.functions.AvroCodec
import graft.model.EventSchema
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Test-only stand-in for the spark-avro connector's functions object —
  * same shape `probeNative` resolves, marker behavior so dispatch and
  * schema binding are observable. */
object FakeAvroFns {
  def to_avro(data: Column, jsonFormatSchema: String): Column =
    concat(lit("to:"), lit(jsonFormatSchema))
  def from_avro(data: Column, jsonFormatSchema: String): Column =
    concat(lit("from:"), lit(jsonFormatSchema))
}

/**
 * AvroCodec's native-path readiness, spec'd BOTH WAYS with the connector
 * jar absent (the only state this environment can produce): the probe
 * selects the UDF fallback against the real connector class name, never
 * throws on garbage, and — via a planted object of the connector's shape
 * — actually dispatches reflectively with the reference wire schema
 * bound, which is exactly what will happen the day /opt/spark/jars
 * grows the module.
 */
class AvroNativePathSpec extends SparkSpec {
  import spark.implicits._

  test("connector absent: probe selects the UDF fallback and round-trips") {
    assert(AvroCodec.probeNative(AvroCodec.NativeFunctionsClass,
      AvroCodec.NativeExpressionClass).isEmpty,
      "this environment ships no spark-avro connector jar — if this " +
        "starts failing, the native path is live; re-verify q03/q04")
    assert(!AvroCodec.nativePathActive)
    val df = Seq(("id-1", "evt", Map("k" -> "v", "k2" -> "v2"), 11L, 7L))
      .toDF("id", "name", "props", "sts", "cts")
      .select(AvroCodec.fromAvro(AvroCodec.toAvro(col("id"), col("name"),
        col("props"), col("sts"), col("cts"))).as("e"))
    val r = df.select(col("e.id"), col("e.name"), col("e.props"),
      col("e.serverTimestamp"), col("e.clientTimestamp")).head()
    assert(r.getString(0) == "id-1" && r.getString(1) == "evt")
    assert(r.getMap[String, String](2).toMap ==
      Map("k" -> "v", "k2" -> "v2"))
    assert(r.getLong(3) == 11L && r.getLong(4) == 7L)
  }

  test("probe never throws: a missing or malformed class selects the fallback") {
    assert(AvroCodec.probeNative("no.such.Class$", "java.lang.String").isEmpty)
    // a real class WITHOUT the connector's method shape also falls back
    assert(AvroCodec.probeNative("java.lang.String", "java.lang.String").isEmpty)
    // the API object alone must NOT pass: Spark 4 ships the functions
    // object without the module's expression classes, and columns built
    // from it fail at analysis — the guard class is what proves the jar
    assert(AvroCodec.probeNative(AvroCodec.NativeFunctionsClass,
      "no.such.Guard").isEmpty)
  }

  test("probe dispatches a connector-shaped object with the wire schema bound") {
    val n = AvroCodec.probeNative("graft.FakeAvroFns$", "graft.FakeAvroFns$")
    assert(n.isDefined, "a MODULE$ object with to_avro/from_avro(Column, " +
      "String) must be resolved — this is the connector's exact shape")
    val out = Seq(1).toDF("x")
      .select(n.get.toAvro(col("x")).as("t"), n.get.fromAvro(col("x")).as("f"))
      .head()
    // marker columns prove reflective dispatch AND that the reference
    // wire schema (EventSchema.avroJson) is what got bound
    assert(out.getString(0) == "to:" + EventSchema.avroJson)
    assert(out.getString(1) == "from:" + EventSchema.avroJson)
  }
}
