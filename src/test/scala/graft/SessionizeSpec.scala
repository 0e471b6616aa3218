package graft

import java.sql.Timestamp

import graft.streaming.Sessionize
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Custom-state sessionization spec (flatMapGroupsWithState). */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private val base = 1704067200000L
  private def ev(user: Long, offsetS: Long, name: String = "e", value: Double = 1.0) =
    Sessionize.SessionEvent(user, new Timestamp(base + offsetS * 1000), name, value)

  test("sessions close on in-batch gap and on watermark timeout") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Sessionize.SessionEvent]
    val q = Sessionize.userSessions(source.toDF(), gapMs = 60000L, "5 seconds")
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      // user 1: two sessions split by a 10-min in-batch gap;
      // user 2: one session
      source.addData(
        ev(1, 0, "login", 2.0), ev(1, 30, "click", 3.0),
        ev(1, 630, "login", 5.0),
        ev(2, 0, "buy", 7.0))
      q.processAllAvailable()
      // advance the watermark far past every open session's timeout
      source.addData(ev(9, 7200))
      q.processAllAvailable()
      source.addData(ev(9, 14400)) // one more batch so timeouts fire
      q.processAllAvailable()

      val out = spark.table("sessions_out")
        .as[Sessionize.SessionSummary].collect()
        .sortBy(x => (x.user_id, x.session_start.getTime))
      val u1 = out.filter(_.user_id == 1)
      assert(u1.length === 2)
      assert(u1(0).n_events === 2 && u1(0).total_value === 5.0)
      assert(u1(0).first_name === "login" && u1(0).last_name === "click")
      assert(u1(1).n_events === 1 && u1(1).total_value === 5.0)
      val u2 = out.filter(_.user_id == 2)
      assert(u2.length === 1 && u2(0).n_events === 1 && u2(0).total_value === 7.0)
    } finally q.stop()
  }

  test("streaming sessionization == batch gap/cumsum sessionization (q47) on real events") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._

    val gapMs = 30 * 60 * 1000L // q47's 30-minute inactivity gap
    val evs = graft.model.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"),
        col("event_type").as("name"), col("value"))
      .as[Sessionize.SessionEvent].collect()
    val maxTs = evs.map(_.ts.getTime).max

    val source = MemoryStream[Sessionize.SessionEvent]
    val q = Sessionize.userSessions(source.toDF(), gapMs, "1 second")
      .writeStream.format("memory").queryName("sessions_x47")
      .outputMode("append").start()
    try {
      source.addData(evs.toSeq)
      q.processAllAvailable()
      // sentinel user far in the future advances the watermark so every
      // open session times out and is emitted
      val sentinel = Sessionize.SessionEvent(999999999L,
        new Timestamp(maxTs + 86400000L), "x", 0.0)
      source.addData(sentinel)
      q.processAllAvailable()
      source.addData(sentinel.copy(ts = new Timestamp(maxTs + 2 * 86400000L)))
      q.processAllAvailable()

      val streaming = spark.table("sessions_x47")
        .filter(col("user_id") =!= 999999999L)
        .select(col("user_id"),
          date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("start"),
          date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss").as("end"),
          col("n_events"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3))).toSet

      val batch = graft.queries.Registry.byName("q47_sessionization")
        .fn(spark, sfDir)
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("n_events"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3))).toSet

      assert(streaming === batch)
    } finally q.stop()
  }
}
