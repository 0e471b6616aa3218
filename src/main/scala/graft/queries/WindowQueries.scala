package graft.queries

import graft.model.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Window-function surface (SURVEY.md §2.5): ranking, analytic and frame
 * windows. Each window partitions by a key whose cardinality grows with the
 * data (supplier, user), so state per partition stays bounded at 100 TB;
 * orderings always carry a unique tie-break so results are total-order
 * deterministic.
 */
object WindowQueries {

  // Per-group top-K via row_number — the scalable "top orders per segment"
  // pattern (rank state is O(1) per partition, one shuffle on the key).
  val q26 = Q(
    "q26_topk_per_group",
    (s, d) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w).cast("bigint"))
        .filter(col("rn") <= 3)
        .select(col("o_orderpriority"), col("rn"), col("o_orderkey"),
          Det.fr(col("o_totalprice"), 2).as("totalprice"))
        .orderBy("o_orderpriority", "rn")
    },
    Some(
      s"""SELECT o_orderpriority, rn, o_orderkey, ${Det.frSql("o_totalprice", 2)} AS totalprice
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |        ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders)
        |WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin))

  // Running (prefix) sum over an ordered frame.
  val q27 = Q(
    "q27_running_sum",
    (s, d) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.lineitem(s, d)
        .filter(col("l_suppkey") <= 3)
        .withColumn("running_qty", round(sum(col("l_quantity")).over(w), 2))
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("shipdate"),
          col("l_quantity"), col("running_qty"))
        .orderBy("l_suppkey", "shipdate", "l_orderkey", "l_linenumber")
    },
    Some(
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |       strftime(l_shipdate, '%Y-%m-%d') AS shipdate, l_quantity,
        |       ROUND(SUM(l_quantity) OVER (PARTITION BY l_suppkey
        |         ORDER BY l_shipdate, l_orderkey, l_linenumber
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
        |FROM lineitem WHERE l_suppkey <= 3
        |ORDER BY l_suppkey, shipdate, l_orderkey, l_linenumber""".stripMargin))

  // lag/lead — inter-event gaps per user (the sessionization primitive).
  val q28 = Q(
    "q28_lag_lead",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .filter(col("user_id") < 20)
        .withColumn("gap_ms",
          unix_millis(col("ts").cast("timestamp")) -
            lag(unix_millis(col("ts").cast("timestamp")), 1).over(w))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .select(col("user_id"), col("event_id"), col("event_type").as("name"),
          col("gap_ms"), col("next_type"))
        .orderBy("user_id", "event_id")
    },
    Some(
      """SELECT user_id, event_id, event_type AS name,
        |       CAST(epoch_ms(ts) AS BIGINT)
        |         - LAG(CAST(epoch_ms(ts) AS BIGINT), 1)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_ms,
        |       LEAD(event_type, 1)
        |         OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |FROM events WHERE user_id < 20 ORDER BY user_id, event_id""".stripMargin))

  // rank / dense_rank / ntile over acctbal within nation.
  val q29 = Q(
    "q29_rank_functions",
    (s, d) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.customer(s, d)
        .withColumn("rnk", rank().over(w).cast("bigint"))
        .withColumn("drnk", dense_rank().over(w).cast("bigint"))
        .withColumn("quartile", ntile(4).over(w).cast("bigint"))
        .filter(col("rnk") <= 5)
        .select(col("c_nationkey"), col("rnk"), col("drnk"), col("quartile"),
          col("c_custkey"), Det.fr(col("c_acctbal"), 2).as("acctbal"))
        .orderBy("c_nationkey", "rnk", "c_custkey")
    },
    Some(
      s"""SELECT c_nationkey, rnk, drnk, quartile, c_custkey,
         |       ${Det.frSql("c_acctbal", 2)} AS acctbal
        |FROM (SELECT c_nationkey, c_custkey, c_acctbal,
        |        RANK() OVER w AS rnk, DENSE_RANK() OVER w AS drnk,
        |        NTILE(4) OVER w AS quartile
        |      FROM customer
        |      WINDOW w AS (PARTITION BY c_nationkey
        |                   ORDER BY c_acctbal DESC, c_custkey))
        |WHERE rnk <= 5 ORDER BY c_nationkey, rnk, c_custkey""".stripMargin))

  // Batch sessionization via the gap/cumsum window pattern: a session
  // boundary is an event arriving more than `gap` after its predecessor;
  // the session id is the running count of boundaries. One shuffle on
  // user_id; complements session_window (q32-34's family) with per-
  // session custom aggregates, and mirrors graft.streaming.Sessionize's
  // semantics in oracle-checkable batch form.
  val q47 = Q(
    "q47_sessionization",
    (s, d) => {
      val gapMs = 30 * 60 * 1000L // 30-minute inactivity gap
      val order = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("prev_ms", lag(unix_millis(col("ts")), 1).over(order))
        .withColumn("boundary",
          when(col("prev_ms").isNull ||
            unix_millis(col("ts")) - col("prev_ms") > gapMs, 1L).otherwise(0L))
        .withColumn("session_id", sum(col("boundary")).over(
          order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(
          date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_end"),
          count(lit(1)).as("n_events"),
          Det.dsum(col("value")).as("total_value"))
        .orderBy("user_id", "session_id")
    },
    Some(
      s"""WITH ordered AS (
         |  SELECT user_id, ts, event_id, value,
         |         lag(epoch_ms(ts)) OVER (PARTITION BY user_id
         |           ORDER BY ts, event_id) AS prev_ms
         |  FROM events),
         |flagged AS (
         |  SELECT *, CASE WHEN prev_ms IS NULL
         |                   OR epoch_ms(ts) - prev_ms > 1800000
         |                 THEN 1 ELSE 0 END AS boundary
         |  FROM ordered),
         |sessions AS (
         |  SELECT *, CAST(SUM(boundary) OVER (PARTITION BY user_id
         |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
         |  FROM flagged)
         |SELECT user_id, session_id,
         |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
         |       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
         |       COUNT(*) AS n_events, ${Det.dsumSql("value")} AS total_value
         |FROM sessions GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  // q64 — as-of join (graft.ops.AsOfJoin): each click gets the user's
  // most recent prior-or-simultaneous purchase. Oracle is DuckDB's
  // native ASOF LEFT JOIN — the operator composes union-tag + window
  // last_value (one shuffle), never a nested-loop non-equi join.
  val q64 = Q(
    "q64_asof_join",
    (s, d) => {
      val e = Tables.events(s, d)
      val clicks = e
        .filter(col("event_type") === "click" && col("user_id") < 100)
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = graft.ops.Dedup.latestByKey(
        e.filter(col("event_type") === "purchase"),
        Seq("user_id", "ts"), Seq(col("event_id")))
        .select(col("user_id"), col("ts"), col("value"))
      graft.ops.AsOfJoin.asof(clicks, purchases, "user_id", "ts", "ts")
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_str"),
          col("asof.value").as("purchase_value"),
          date_format(col("asof.ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .as("purchase_ts"))
        .orderBy("event_id")
    },
    Some(
      """WITH p0 AS (SELECT user_id, ts, value, event_id FROM events
        |            WHERE event_type = 'purchase'),
        |p AS (SELECT user_id, ts, value FROM (
        |        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, ts
        |          ORDER BY event_id DESC) AS rn FROM p0)
        |      WHERE rn = 1),
        |c AS (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'click' AND user_id < 100)
        |SELECT c.event_id, c.user_id,
        |       strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
        |       p.value AS purchase_value,
        |       strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts
        |FROM c ASOF LEFT JOIN p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.event_id""".stripMargin))

  // q65 — binned range join (graft.ops.RangeJoin): clicks landing inside
  // each signup's 30-minute attribution window, as a bin equi-join +
  // exact filter — never a nested-loop BETWEEN join. Oracle is the plain
  // inequality join (fine at oracle scale).
  val q65 = Q(
    "q65_range_join",
    (s, d) => {
      val e = Tables.events(s, d)
      val clicks = e.filter(col("event_type") === "click" && col("user_id") < 30)
        .select(col("event_id"), col("ts"))
      val windows = e.filter(col("event_type") === "signup" && col("user_id") < 30)
        .select(col("event_id").as("promo_id"), col("ts").as("w_start"),
          (col("ts") + expr("INTERVAL 30 MINUTES")).as("w_end"))
      graft.ops.RangeJoin.pointInInterval(
        clicks, "ts", windows, "w_start", "w_end", binMs = 30 * 60 * 1000L)
        .groupBy("promo_id")
        .agg(count(lit(1)).as("n_clicks"))
        .orderBy("promo_id")
    },
    Some(
      """WITH c AS (SELECT event_id, ts FROM events
        |           WHERE event_type = 'click' AND user_id < 30),
        |w AS (SELECT event_id AS promo_id, ts AS w_start,
        |             ts + INTERVAL 30 MINUTE AS w_end
        |      FROM events WHERE event_type = 'signup' AND user_id < 30)
        |SELECT promo_id, COUNT(*) AS n_clicks
        |FROM w JOIN c ON c.ts >= w_start AND c.ts < w_end
        |GROUP BY 1 ORDER BY 1""".stripMargin))

  // q77 — analytic-distribution windows: percent_rank / cume_dist /
  // nth_value over a uniquely-ordered frame. (rank-1)/(N-1) and
  // rank/N are single IEEE divisions of exact integers, so the doubles
  // are bit-identical cross-engine with no rounding; the unique
  // (value, event_id) ordering makes RANGE == ROWS for nth_value.
  val q77 = Q(
    "q77_distribution_windows",
    (s, d) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value"), col("event_id"))
      Tables.events(s, d)
        .filter(col("user_id") < 25)
        .select(col("event_type"), col("event_id"), col("value"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          nth_value(col("event_id"), 3).over(w).as("third_id"))
        .orderBy("event_type", "event_id")
    },
    Some(
      """SELECT event_type, event_id, value,
        |       percent_rank() OVER w AS pr,
        |       cume_dist() OVER w AS cd,
        |       nth_value(event_id, 3) OVER w AS third_id
        |FROM events WHERE user_id < 25
        |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
        |ORDER BY event_type, event_id""".stripMargin))

  // q78 — time-series resample + forward-fill: an hourly grid per user
  // (sequence + explode — rows generated, never collected) as-of joined
  // to each user's latest event at or before the grid point. Composes
  // graft.ops.AsOfJoin a second way (gap-fill, where q64 is enrichment);
  // the oracle is DuckDB generate_series + native ASOF LEFT JOIN.
  val q78 = Q(
    "q78_resample_ffill",
    (s, d) => {
      val e = Tables.events(s, d)
        .filter(col("user_id") < 10)
        .select(col("user_id"), col("ts"), col("value"), col("event_id"))
      val bounds = e.agg(
        date_trunc("hour", min(col("ts"))).as("t0"), max(col("ts")).as("t1"))
      val grid = e.select(col("user_id")).distinct()
        .crossJoin(broadcast(bounds))
        .select(col("user_id"),
          explode(expr("sequence(t0, t1, interval 1 hour)")).as("grid_ts"))
      val latest = graft.ops.Dedup.latestByKey(e,
        Seq("user_id", "ts"), Seq(col("event_id")))
        .select(col("user_id"), col("ts"), col("value"))
      graft.ops.AsOfJoin.asof(grid, latest, "user_id", "grid_ts", "ts")
        .select(col("user_id"),
          date_format(col("grid_ts"), "yyyy-MM-dd HH:mm:ss").as("grid_ts"),
          col("asof.value").as("v"))
        .orderBy("user_id", "grid_ts")
    },
    Some(
      """WITH e AS (SELECT user_id, ts, value, event_id FROM events
        |           WHERE user_id < 10),
        |b AS (SELECT date_trunc('hour', MIN(ts)) AS t0, MAX(ts) AS t1 FROM e),
        |grid AS (
        |  SELECT user_id,
        |         unnest(generate_series(b.t0, b.t1, INTERVAL 1 HOUR)) AS grid_ts
        |  FROM (SELECT DISTINCT user_id FROM e) u, b),
        |r AS (SELECT user_id, ts, value FROM (
        |        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, ts
        |          ORDER BY event_id DESC) AS rn FROM e)
        |      WHERE rn = 1)
        |SELECT g.user_id, strftime(g.grid_ts, '%Y-%m-%d %H:%M:%S') AS grid_ts,
        |       r.value AS v
        |FROM grid g ASOF LEFT JOIN r
        |  ON g.user_id = r.user_id AND g.grid_ts >= r.ts
        |ORDER BY 1, 2""".stripMargin))

  val all: Vector[Q] = Vector(q26, q27, q28, q29, q47, q64, q65, q77, q78)
}
