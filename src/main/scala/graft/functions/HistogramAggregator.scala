package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * One-pass Prometheus-style bucket histogram as a typed Aggregator —
 * the reference's latency/payload histogram metric shape
 * (`server/metrics/metrics.go:59-71,93-124`: cumulative `le` buckets
 * plus count and sum) as a single Spark aggregate.
 *
 * Buffer is a fixed small array, reduce/merge are O(buckets) — the
 * aggregate is map-side combinable, so at 100 TB each task emits one
 * (buckets+2)-long buffer per group and the shuffle carries only
 * partial histograms, never observations.
 */
object HistogramAggregator {

  /** Partial state: per-bin counts (buckets.length + 1 for +Inf) plus the
    * observation sum in scaled integer units (cents at scale=100). Integer
    * addition is associative, so the sum is identical under any partial-
    * aggregation/merge order — double accumulation here broke the round-2
    * hash check (q46) when a group landed on a round-half boundary. */
  final case class Buf(bins: Array[Long], sumUnits: Long)

  /** Finished histogram: cumulative counts per `le` bucket (last entry
    * is the +Inf bucket == total count) plus the observation sum rendered
    * from exact integer units by one IEEE division (order-free). */
  final case class Hist(cumulative: Seq[Long], count: Long, sum: Double)

  /** Prometheus-style histogram over a double column with the given
    * ascending `le` bucket upper bounds. `scale` fixes the sum's decimal
    * resolution (100 = cents); exact for inputs with matching precision. */
  final class BucketHistogram(buckets: Array[Double], scale: Double = 100.0)
      extends Aggregator[Double, Buf, Hist] {
    require(buckets.sorted.sameElements(buckets), "buckets must be ascending")

    override def zero: Buf = Buf(new Array[Long](buckets.length + 1), 0L)

    private def binOf(x: Double): Int = {
      var i = 0
      while (i < buckets.length && x > buckets(i)) i += 1
      i
    }

    override def reduce(b: Buf, x: Double): Buf = {
      b.bins(binOf(x)) += 1
      Buf(b.bins, b.sumUnits + math.floor(x * scale + 0.5).toLong)
    }

    override def merge(a: Buf, b: Buf): Buf = {
      var i = 0
      while (i < a.bins.length) { a.bins(i) += b.bins(i); i += 1 }
      Buf(a.bins, a.sumUnits + b.sumUnits)
    }

    override def finish(b: Buf): Hist = {
      val cum = new Array[Long](b.bins.length)
      var acc = 0L
      var i = 0
      while (i < b.bins.length) { acc += b.bins(i); cum(i) = acc; i += 1 }
      Hist(cum.toSeq, acc, b.sumUnits / scale)
    }

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Hist] = Encoders.product[Hist]
  }

  /** The reference's server-latency SLO buckets (metrics.go:59-64). */
  val latencyBucketsMs: Array[Double] = Array(10, 30, 50, 100, 500)
}
