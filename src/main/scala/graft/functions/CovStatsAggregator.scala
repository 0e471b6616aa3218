package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * One-pass second-moment sufficient statistics over quantized embedding
 * vectors — the covariance front of a whitening/PCA stage (the
 * dimensionality-reduction step a semantic-dedup or retrieval pipeline
 * runs before clustering; cf. SemDeDup-style pipelines that decorrelate
 * embeddings first).
 *
 * The buffer packs `[n | Σq_0..Σq_{d-1} | Σq_i·q_j for i ≤ j]` into one
 * long array (`1 + d + d(d+1)/2` cells — 2 145 longs at d = 64). Reduce
 * folds one vector in O(d²); merge is element-wise addition. All
 * arithmetic is EXACT integer math over the caller's fixed-point
 * quantization, so the result is identical under any partial-aggregation
 * or merge order — the same reassociation-proofing as
 * [[HistogramAggregator]] (double accumulation broke the round-2 q46
 * hash).
 *
 * Scale shape: the aggregate is map-side combinable — at 100 TB every
 * task emits ONE ~17 KB buffer and the shuffle carries partial moment
 * matrices, never vectors. The d×d result is sufficient statistics: a
 * driver-side eigen/whitening step (cf. [[graft.llm.EmbeddingOps]])
 * reads 2 080 numbers, not the corpus — the same collect-the-model
 * pattern as BPE merge learning.
 *
 * Overflow budget: |q| ≤ Q ⇒ each product ≤ Q²; the cell sum stays in
 * int64 while n·Q² < 2⁶³ (Q = 10⁴ ⇒ n < 9·10¹⁰ vectors — beyond that,
 * shard the corpus and merge per-shard stats in DECIMAL).
 */
object CovStatsAggregator {

  /** Partial state: the packed moment array (product-encoded, like
    * HistogramAggregator.Buf). */
  final case class Buf(cells: Array[Long])

  /** Finished statistics: the same packed layout, as an immutable Seq. */
  final case class Stats(cells: Seq[Long])

  final class CovStats(d: Int)
      extends Aggregator[Seq[Long], Buf, Stats] {
    require(d > 0, "dimension must be positive")
    private val len = 1 + d + d * (d + 1) / 2

    override def zero: Buf = Buf(new Array[Long](len))

    override def reduce(b: Buf, q: Seq[Long]): Buf = {
      require(q.length == d, s"expected $d-dim vector, got ${q.length}")
      val v = q.toArray
      val c = b.cells
      c(0) += 1L
      var i = 0
      while (i < d) { c(1 + i) += v(i); i += 1 }
      var k = 1 + d
      i = 0
      while (i < d) {
        var j = i
        while (j < d) { c(k) += v(i) * v(j); k += 1; j += 1 }
        i += 1
      }
      b
    }

    override def merge(a: Buf, b: Buf): Buf = {
      var i = 0
      while (i < len) { a.cells(i) += b.cells(i); i += 1 }
      a
    }

    override def finish(b: Buf): Stats = Stats(b.cells.toSeq)

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Stats] = Encoders.product[Stats]
  }
}
