package graft

import java.nio.file.Files

import graft.functions.HistogramAggregator
import graft.ingest.Ingest
import graft.pipeline.DatePartition
import graft.queries.IngestQueries
import org.apache.spark.sql.functions._

/**
 * Landing-pipeline specs (SURVEY.md S5/S6/T9): partitioned append,
 * partition PRUNING evidence on read-back, and the one-pass histogram
 * aggregator's semantics.
 */
class PipelineSpec extends SparkSpec {

  test("S6 partitioned append lands Hive-style dirs and prunes on read") {
    val out = Files.createTempDirectory("graft_part").toString
    val df = Ingest.validate(IngestQueries.incoming(spark, sfDir))
    DatePartition.appendPartitioned(df, out)

    // Hive-style layout: year=YYYY/month=MM/day=DD
    val dirs = new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("year="))
    assert(dirs.nonEmpty)

    val back = spark.read.parquet(out)
      .filter(col("year") === "2024" && col("month") === "01" && col("day") === "05")
    // pruning evidence: the physical plan's partition filters hit y/m/d
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"))
    assert(plan.contains("year") && plan.contains("month") && plan.contains("day"))
    // and the rows come back correct vs recomputing from the source
    val expected = DatePartition.withDateParts(df)
      .filter(col("date") === "2024-01-05").count()
    assert(back.count() === expected)
  }

  test("T9 date derivation matches the notebook formula") {
    import spark.implicits._
    val df = Seq(1704067200000L, 1706745599000L) // 2024-01-01, 2024-01-31 23:59:59
      .toDF("clientTimestamp")
    val parts = DatePartition.withDateParts(df)
      .select("year", "month", "day").as[(String, String, String)]
      .collect().toSeq
    assert(parts === Seq(("2024", "01", "01"), ("2024", "01", "31")))
  }

  test("histogram aggregator: bins, merge and cumulative finish") {
    val agg = new HistogramAggregator.BucketHistogram(Array(10, 30, 50))
    val b = Seq(5.0, 10.0, 10.1, 29.0, 51.0, 1000.0)
      .foldLeft(agg.zero)(agg.reduce)
    val merged = agg.merge(b, Seq(45.0).foldLeft(agg.zero)(agg.reduce))
    val h = agg.finish(merged)
    // le=10: {5,10}; le=30: +{10.1,29}; le=50: +{45}; +Inf: +{51,1000}
    assert(h.cumulative === Seq(2L, 4L, 5L, 7L))
    assert(h.count === 7L)
    assert(h.sum === 5.0 + 10.0 + 10.1 + 29.0 + 51.0 + 1000.0 + 45.0)
  }
}
