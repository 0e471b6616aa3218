package graft

import org.apache.spark.sql.functions._
import graft.llm.Classifier

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  // A separable planted corpus: "good" docs are long and lexically
  // diverse, "bad" docs are short or repetitive.
  private val planted = docs(
    (1L, (1 to 120).map(i => s"word$i").mkString(" ")),
    (2L, (1 to 110).map(i => s"term$i and token$i").mkString(" ")),
    (3L, (1 to 130).map(i => s"item$i").mkString(" ")),
    (4L, "spam spam spam spam"),
    (5L, "buy buy buy"),
    (6L, "x x x x x x x x"))

  test("student reproduces a separable teacher exactly") {
    val out = Classifier.centroidGate(planted,
      col("n_distinct") >= 50).orderBy("doc_id").collect()
    assert(out.map(_.getInt(1)).toSeq == Seq(1, 1, 1, 0, 0, 0)) // teacher
    // on a cleanly separable corpus the centroid student agrees everywhere
    assert(out.forall(r => r.getInt(3) == 1))
  }

  test("teacher and student columns are 0/1 and agree flag is consistent") {
    val out = Classifier.qualityTeacherGate(planted).collect()
    assert(out.forall(r => Set(0, 1)(r.getInt(1)) && Set(0, 1)(r.getInt(2))))
    assert(out.forall(r =>
      r.getInt(3) == (if (r.getInt(1) == r.getInt(2)) 1 else 0)))
  }

  test("degenerate single-class corpora fall back, never claim the empty class") {
    val allPos = Classifier.centroidGate(planted, lit(true)).collect()
    assert(allPos.forall(_.getInt(2) == 1))
    val allNeg = Classifier.centroidGate(planted, lit(false)).collect()
    assert(allNeg.forall(_.getInt(2) == 0))
  }

  test("null text classifies as empty instead of raising") {
    val withNull = Seq((1L, Option("a normal document here")),
      (2L, None: Option[String])).toDF("doc_id", "text")
    val out = Classifier.centroidGate(withNull, col("n_distinct") >= 3)
      .orderBy("doc_id").collect()
    assert(out.length == 2)
    // the null doc has n_distinct = 1 ([""]), so it labels negative
    assert(out(1).getInt(1) == 0)
  }

  test("calibrationReport: bucket mass reconciles; agreement matches the gate") {
    val rep = Classifier.calibrationReport(planted).orderBy("bucket").collect()
    // buckets partition the corpus
    assert(rep.map(_.getLong(1)).sum == 6L)
    rep.foreach { r =>
      val b = r.getLong(0)
      assert(b >= 0L && b <= 9L)
      assert(r.getLong(2) <= r.getLong(1)) // n_label_pos <= n_docs
      assert(r.getLong(3) <= r.getLong(1)) // n_pred_pos  <= n_docs
      assert(r.getLong(4) <= r.getLong(1)) // n_agree     <= n_docs
    }
    // total agreement equals the per-doc gate's agree mass
    val agree = Classifier.qualityTeacherGate(planted)
      .agg(sum(col("agree"))).head.getLong(0)
    assert(rep.map(_.getLong(4)).sum == agree)
    // one bucket per distinct qs decile at most
    assert(rep.map(_.getLong(0)).distinct.length == rep.length)
  }

  test("classification never shuffles the corpus: centroids broadcast") {
    val plan = Classifier.qualityTeacherGate(planted)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), plan.take(600))
    assert(!plan.contains("SortMergeJoin"), plan.take(600))
  }
}
