package graft

import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Dedup operator specs — the at-least-once repair contract (B7). */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def dupes = Seq(
    ("a", 1L, "x"), ("a", 1L, "x"),       // exact duplicate
    ("a", 2L, "y"),                        // same key, later ts
    ("b", 5L, "z")
  ).toDF("id", "ts", "payload")

  test("exact dedup collapses identical rows only") {
    val out = Dedup.exact(dupes)
    assert(out.count() === 3)
  }

  test("byKey keeps one row per key") {
    assert(Dedup.byKey(dupes, Seq("id")).count() === 2)
  }

  test("latestByKey deterministically keeps the row sorting last") {
    val out = Dedup.latestByKey(dupes, Seq("id"), Seq(col("ts")))
      .select("id", "ts", "payload").as[(String, Long, String)]
      .collect().sortBy(_._1)
    assert(out.toSeq === Seq(("a", 2L, "y"), ("b", 5L, "z")))
  }

  test("duplicated stream collapses back to the original (README contract)") {
    val events = graft.model.Tables.events(spark, sfDir)
      .withColumn("ts", col("ts").cast("long"))
    val doubled = events.unionAll(events)
    assert(Dedup.exact(doubled).count() === events.count())
  }
}
