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

  test("dupLeakageMatrix: cross-source clones land off-diagonal, canonical pair order") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "web"),
      (2L, "the quick brown fox jumps over the lazy dog", "web"),
      (3L, "the quick brown fox jumps over the lazy dog", "books"),
      (4L, "completely different content entirely unrelated words here", "books")
    ).toDF("doc_id", "text", "source")
    // pairs (1,2) web∩web, (1,3) and (2,3) web∩books — both cross rows
    // canonicalize to (books, web) regardless of id order
    val m = graft.llm.DedupOps.dupLeakageMatrix(docs)
      .select("source_a", "source_b", "n_pairs")
      .as[(String, String, Long)].collect().sortBy(r => (r._1, r._2))
    assert(m.toSeq === Seq(("books", "web", 2L), ("web", "web", 1L)))
  }
}
