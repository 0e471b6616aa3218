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

  test("DedupOps.exactDedup: min-id representative per verbatim clone group, nulls routed around") {
    val docs = Seq(
      (5L, "a b c"), (2L, "a b c"),            // clones -> keep 2
      (3L, "x y z"),                           // singleton
      (7L, null.asInstanceOf[String]),         // null text kept as-is
      (8L, null.asInstanceOf[String]),         // both nulls survive
      (9L, "")                                 // empty string is its own group
    ).toDF("doc_id", "text")
    val kept = graft.llm.DedupOps.exactDedup(docs)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(2L, 3L, 7L, 8L, 9L))
  }
}
