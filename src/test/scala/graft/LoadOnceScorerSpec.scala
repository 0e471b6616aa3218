package graft

import graft.llm.{BpeIndex, ClassifierIndex, DeconIndex, DsirIndex, UnigramIndex}
import graft.model.Tables
import org.apache.spark.sql.functions._

/**
 * Round-20 optimization pins: every streaming scorer gained a LOAD-ONCE
 * form (model state loads once per stream, not once per micro-batch —
 * guide §4.5). These tests pin that the load-once closure is
 * row-identical to the per-call operator on the same input, and that it
 * stays identical when applied to several disjoint batches (the
 * foreachBatch shape the streaming queries run it in).
 */
class LoadOnceScorerSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sfDir)
    .select(col("doc_id"), col("text"))
  private lazy val tmp =
    java.nio.file.Files.createTempDirectory("load_once_spec").toString

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  private def batches = Seq(
    docs.filter(col("doc_id") % 3 === 0),
    docs.filter(col("doc_id") % 3 === 1),
    docs.filter(col("doc_id") % 3 === 2))

  test("DsirIndex.scorer == scoreStream per batch") {
    val dir = s"$tmp/dsir"
    DsirIndex.build(docs, docs.filter(col("doc_id") % 4 === 0), dir,
      buckets = 256)
    val sc = DsirIndex.scorer(spark, dir)
    batches.foreach { b =>
      assert(rows(sc(b)) === rows(DsirIndex.scoreStream(spark, dir, b)))
    }
  }

  test("DeconIndex.winnowProber == probeWinnowStream per batch") {
    val dir = s"$tmp/decon"
    DeconIndex.build(docs.filter(col("doc_id") % 41 === 3), dir)
    val pr = DeconIndex.winnowProber(spark, dir, minShared = 2L)
    batches.foreach { b =>
      assert(rows(pr(b)) ===
        rows(DeconIndex.probeWinnowStream(b, dir, minShared = 2L)))
    }
  }

  test("ClassifierIndex.scorer == scoreStream per batch") {
    val dir = s"$tmp/classifier"
    ClassifierIndex.build(docs, dir)
    val sc = ClassifierIndex.scorer(spark, dir)
    batches.foreach { b =>
      assert(rows(sc(b)) === rows(ClassifierIndex.scoreStream(spark, dir, b)))
    }
  }

  test("BpeIndex.driftScorer == driftScoreStream per batch") {
    val dir = s"$tmp/bpe"
    BpeIndex.build(docs, dir, k = 8)
    val sc = BpeIndex.driftScorer(spark, dir)
    batches.foreach { b =>
      assert(rows(sc(b)) === rows(BpeIndex.driftScoreStream(spark, dir, b)))
    }
  }

  test("UnigramIndex.driftScorer/tokenStreamer == per-call forms per batch") {
    val dir = s"$tmp/unigram"
    UnigramIndex.build(docs, dir, 4, 3, 2L, 64)
    val sc = UnigramIndex.driftScorer(spark, dir)
    val tk = UnigramIndex.tokenStreamer(spark, dir)
    batches.foreach { b =>
      assert(rows(sc(b)) ===
        rows(UnigramIndex.driftScoreStream(spark, dir, b)))
      assert(rows(tk(b)) === rows(UnigramIndex.tokenStream(spark, dir, b)))
    }
  }
}
