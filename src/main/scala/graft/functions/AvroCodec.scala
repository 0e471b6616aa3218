package graft.functions

import java.io.ByteArrayOutputStream

import scala.jdk.CollectionConverters._

import graft.model.{Event, EventSchema}
import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/**
 * Single-record Avro binary codec for the event envelope — the wire format
 * the reference produces to Kafka (one Avro datum per message, no container
 * file: `server/sender/kafka.go:111-117`) and its notebook decodes with
 * `from_avro` (ipynb cell 3).
 *
 * The Spark distribution here ships the Avro library but not the
 * spark-avro connector expressions, so the codec is implemented directly on
 * `org.apache.avro` generic records, exposed as UDFs. That is performance-
 * equivalent to the connector for this shape: the connector's
 * AvroDataToCatalyst/CatalystDataToAvro are CodegenFallback expressions, so
 * neither participates in whole-stage codegen. Per-thread encoder/decoder
 * reuse keeps the per-row cost to the raw Avro encode.
 */
object AvroCodec {

  @transient private lazy val schema: Schema =
    new Schema.Parser().parse(EventSchema.avroJson)

  // One codec kit per executor thread: Avro encoders are stateful.
  private val kit = new ThreadLocal[(GenericDatumWriter[GenericRecord], GenericDatumReader[GenericRecord])] {
    override def initialValue() =
      (new GenericDatumWriter[GenericRecord](schema),
        new GenericDatumReader[GenericRecord](schema))
  }

  private[functions] def encode(id: String, name: String, props: Map[String, String],
      serverTs: Long, clientTs: Long): Array[Byte] = {
    val rec = new GenericData.Record(schema)
    rec.put("id", id)
    rec.put("name", name)
    val m = new java.util.HashMap[String, String]()
    if (props != null) props.foreach { case (k, v) => m.put(k, v) }
    rec.put("props", m)
    rec.put("serverTimestamp", serverTs)
    rec.put("clientTimestamp", clientTs)
    val out = new ByteArrayOutputStream(64)
    val enc = EncoderFactory.get().directBinaryEncoder(out, null)
    kit.get()._1.write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  private[functions] def decode(bytes: Array[Byte]): Event = {
    val dec = DecoderFactory.get().binaryDecoder(bytes, null)
    val rec = kit.get()._2.read(null, dec)
    Event(
      id = rec.get("id").toString,
      name = rec.get("name").toString,
      props = rec.get("props").asInstanceOf[java.util.Map[AnyRef, AnyRef]]
        .asScala.map { case (k, v) => k.toString -> v.toString }.toMap,
      serverTimestamp = rec.get("serverTimestamp").asInstanceOf[Long],
      clientTimestamp = rec.get("clientTimestamp").asInstanceOf[Long])
  }

  private val encodeUdf =
    udf((id: String, name: String, props: Map[String, String], sts: Long, cts: Long) =>
      encode(id, name, props, sts, cts))

  private val decodeUdf = udf((bytes: Array[Byte]) => decode(bytes))

  /** Serialize envelope columns to a single-record Avro datum (T5). */
  def toAvro(id: Column, name: Column, props: Column,
      serverTs: Column, clientTs: Column): Column =
    encodeUdf(id, name, props, serverTs, clientTs)

  /** Decode an Avro datum back to an envelope struct (T6). */
  def fromAvro(value: Column): Column = decodeUdf(value)
}
