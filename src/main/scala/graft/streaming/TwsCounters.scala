package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/**
 * The reference's running event counters (A5, `server/metrics/metrics.go`)
 * on Spark 4's `transformWithState` — the current-generation arbitrary-
 * state API (successor of `flatMapGroupsWithState`, RocksDB-only): typed
 * named state cells with per-cell TTL instead of one opaque state value,
 * and explicit time semantics via `TimeMode`.
 *
 * State per key is two longs (count + order-free integer-cents total, the
 * same determinism discipline as graft.queries.Det); each micro-batch
 * emits the updated running totals per key seen in that batch. TTL on the
 * cells (`ttl`) bounds state for keys that go quiet — the lever that
 * keeps a years-running counter stream's state finite without a
 * watermark-driven window.
 */
object TwsCounters {

  final case class KeyedEvent(name: String, value: Double)
  final case class RunningCount(name: String, n: Long, total_cents: Long)

  final class CounterProcessor(ttl: TTLConfig)
      extends StatefulProcessor[String, KeyedEvent, RunningCount] {
    @transient private var n: ValueState[Long] = _
    @transient private var cents: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      n = getHandle.getValueState[Long]("n", Encoders.scalaLong, ttl)
      cents = getHandle.getValueState[Long]("cents", Encoders.scalaLong, ttl)
    }

    override def handleInputRows(key: String, rows: Iterator[KeyedEvent],
        timerValues: TimerValues): Iterator[RunningCount] = {
      var c = if (n.exists()) n.get() else 0L
      var s = if (cents.exists()) cents.get() else 0L
      rows.foreach { e =>
        c += 1
        s += math.floor(e.value * 100 + 0.5).toLong
      }
      n.update(c)
      cents.update(s)
      Iterator.single(RunningCount(key, c, s))
    }
  }

  /** Running (count, total) per event name; input needs
    * (event_type string, value double). RocksDB state store required —
    * transformWithState does not run on the HDFS-backed provider. */
  def runningCounters(events: DataFrame, ttl: TTLConfig = TTLConfig.NONE)(
      implicit spark: SparkSession): Dataset[RunningCount] = {
    import spark.implicits._
    events.selectExpr("event_type AS name", "value").as[KeyedEvent]
      .groupByKey(_.name)
      .transformWithState(new CounterProcessor(ttl), TimeMode.None(),
        OutputMode.Update())
  }
}
