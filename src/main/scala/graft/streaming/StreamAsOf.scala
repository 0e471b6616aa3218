package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/**
 * Streaming as-of enrichment — graft.ops.AsOfJoin's semantics applied
 * continuously: every probe event is joined to the LATEST reference
 * row for its key with `reference.ts <= probe.ts` ("user state as of
 * the click"), the lookup a stream-enrichment tier runs against a
 * slowly-changing dimension feed.
 *
 * Shape mirrors the batch operator exactly: both feeds are tagged and
 * UNIONed (reference = 0, probe = 1), keyed by the join key, and a
 * `transformWithState` processor keeps ONE reference row per key — the
 * max-timestamp one seen so far — replaying each micro-batch's rows in
 * (ts, tag) order so reference rows at equal timestamps win, the same
 * `<=` tie rule the batch window's sort gives. State is O(keys) and
 * constant per key (the streaming-native bound; the batch operator's
 * window achieves it per partition); `ttl` evicts keys that go quiet.
 *
 * Caveat inherent to streaming: rows are replayed in event-time order
 * WITHIN a micro-batch, so a probe arriving in a later batch than a
 * reference row with a LARGER timestamp sees that future state (the
 * stream trades the batch operator's global sort for bounded state).
 * Feeds that respect per-key event-time order across batches — or any
 * single-batch replay — reproduce the batch result exactly, which is
 * what StreamingSpec pins against AsOfJoin.asof on the q64 fixture.
 */
object StreamAsOf {

  /** Union-tagged input row: tag 0 = reference (payload valid),
    * tag 1 = probe (event_id valid). */
  final case class Tagged(key: Long, ts_ms: Long, tag: Int,
      event_id: Long, payload: Double)

  /** Latest reference row per key. */
  final case class RefState(ts_ms: Long, payload: Double)

  /** One output per probe event; asof_* are None when no reference row
    * at or before the probe's timestamp has been seen. */
  final case class Enriched(event_id: Long, key: Long, ts_ms: Long,
      asof_ts: Option[Long], asof_payload: Option[Double])

  final class Processor(ttl: TTLConfig)
      extends StatefulProcessor[Long, Tagged, Enriched] {
    @transient private var latest: ValueState[RefState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      latest = getHandle.getValueState[RefState]("latest",
        Encoders.product[RefState], ttl)

    override def handleInputRows(key: Long, rows: Iterator[Tagged],
        timerValues: TimerValues): Iterator[Enriched] = {
      val out = Vector.newBuilder[Enriched]
      var cur = if (latest.exists()) Option(latest.get()) else None
      // (ts, tag) order: reference rows precede probes at equal ts,
      // giving the batch operator's <= semantics
      for (r <- rows.toSeq.sortBy(x => (x.ts_ms, x.tag))) {
        if (r.tag == 0) {
          if (cur.forall(_.ts_ms <= r.ts_ms))
            cur = Some(RefState(r.ts_ms, r.payload))
        } else {
          out += Enriched(r.event_id, key, r.ts_ms,
            cur.map(_.ts_ms), cur.map(_.payload))
        }
      }
      cur.foreach(latest.update)
      out.result().iterator
    }
  }

  /** Tag + union a reference feed (key, ts_ms, payload) and a probe
    * feed (key, ts_ms, event_id) into [[Tagged]] rows. */
  def tagged(references: DataFrame, probes: DataFrame): DataFrame =
    references
      .select(col("key"), col("ts_ms"), lit(0).as("tag"),
        lit(-1L).as("event_id"), col("payload"))
      .unionByName(probes.select(col("key"), col("ts_ms"), lit(1).as("tag"),
        col("event_id"), lit(0.0).as("payload")))

  /** Enrich the probe side of a [[tagged]] stream with the latest
    * reference state per key. RocksDB state store required
    * (transformWithState does not run on the HDFS-backed provider). */
  def enrich(taggedStream: DataFrame, ttl: TTLConfig = TTLConfig.NONE)(
      implicit spark: SparkSession): Dataset[Enriched] = {
    import spark.implicits._
    taggedStream.selectExpr("key", "ts_ms", "tag", "event_id", "payload")
      .as[Tagged]
      .groupByKey(_.key)
      .transformWithState(new Processor(ttl), TimeMode.None(),
        OutputMode.Update())
  }
}
