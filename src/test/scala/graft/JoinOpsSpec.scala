package graft

import graft.model.Tables
import graft.ops.{AsOfJoin, Dedup, RangeJoin}
import org.apache.spark.sql.functions._

/**
 * As-of and range join specs: each operator must (1) produce EXACTLY the
 * rows of its naive non-equi formulation on real data, and (2) plan as
 * shuffle/window machinery — never the nested-loop join the naive form
 * compiles to.
 */
class JoinOpsSpec extends SparkSpec {

  private lazy val events = Tables.events(spark, sfDir)

  test("asof join == naive greatest-ts-per-left non-equi formulation") {
    val clicks = events
      .filter(col("event_type") === "click" && col("user_id") < 50)
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = Dedup.latestByKey(
      events.filter(col("event_type") === "purchase"),
      Seq("user_id", "ts"), Seq(col("event_id")))
      .select(col("user_id"), col("ts"), col("value"))

    val got = AsOfJoin.asof(clicks, purchases, "user_id", "ts", "ts")
      .select(col("event_id"), col("asof.ts").as("p_ts"), col("asof.value").as("p_value"))

    // naive: left join all prior rows, keep the max-ts one per left row
    val naive = clicks.as("c")
      .join(purchases.as("p"),
        col("c.user_id") === col("p.user_id") && col("p.ts") <= col("c.ts"),
        "left")
      .groupBy(col("c.event_id").as("event_id"))
      .agg(max(struct(col("p.ts").as("ts"), col("p.value").as("value"))).as("m"))
      .select(col("event_id"), col("m.ts").as("p_ts"), col("m.value").as("p_value"))

    assert(got.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(got).count() === 0)
    // and the operator's plan is window machinery, not a nested loop
    val plan = AsOfJoin.asof(clicks, purchases, "user_id", "ts", "ts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(plan.contains("Window"))
  }

  test("binned range join == naive BETWEEN join, without a nested-loop plan") {
    val clicks = events
      .filter(col("event_type") === "click" && col("user_id") < 50)
      .select(col("event_id"), col("ts"))
    val windows = events
      .filter(col("event_type") === "signup" && col("user_id") < 50)
      .select(col("event_id").as("promo_id"), col("ts").as("w_start"),
        (col("ts") + expr("INTERVAL 45 MINUTES")).as("w_end"))

    val got = RangeJoin.pointInInterval(
      clicks, "ts", windows, "w_start", "w_end", binMs = 10 * 60 * 1000L)
      .select(col("event_id"), col("promo_id"))
    val naive = clicks.join(windows,
      col("ts") >= col("w_start") && col("ts") < col("w_end"))
      .select(col("event_id"), col("promo_id"))

    assert(got.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(got).count() === 0)
    val plan = RangeJoin.pointInInterval(
      clicks, "ts", windows, "w_start", "w_end", binMs = 10 * 60 * 1000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
