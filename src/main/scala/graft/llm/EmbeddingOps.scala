package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import TextFunctions._

/**
 * Embedding maintenance operators for training-data pipelines:
 * unit-normalization and int8 quantization (the storage/compute
 * compression step before ANN indexing — 4x smaller than float32).
 *
 * Determinism: the scale factor is a per-row array max (order-free);
 * quantized values use explicit floor(x + 0.5) rounding so DuckDB's
 * arithmetic is bit-identical (no dependence on either engine's
 * round-half convention); norms are in-order folds (TextFunctions).
 * Everything is per-row scan-stage compute — no shuffle.
 */
object EmbeddingOps {

  /** Max |x_i| of a float-array column, in double (order-independent). */
  def maxAbs(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double"))))

  /** Symmetric int8 quantization of one element given the scale. */
  private def quantize(x: Column, scale: Column): Column =
    floor(x.cast("double") * lit(127.0) / scale + lit(0.5)).cast("int")

  /**
   * Quantize embeddings to int8 with a per-vector symmetric scale:
   * q_i = floor(x_i * 127 / max|x| + 0.5). Adds the scale (for
   * dequantization) and the quantized array.
   */
  def quantized(embeddings: DataFrame): DataFrame = {
    val scale = maxAbs(col("embedding"))
    embeddings
      .withColumn("q_scale", scale)
      .withColumn("q_embedding",
        transform(col("embedding"), x => quantize(x, col("q_scale"))))
  }

  /** Unit-normalized copy of the embedding (double elements), using the
    * in-order-fold norm so downstream cosines stay oracle-exact. */
  def normalized(embeddings: DataFrame): DataFrame =
    embeddings.withColumn("norm", sqrt(normSq(col("embedding"))))
      .withColumn("embedding_unit",
        transform(col("embedding"), x => x.cast("double") / col("norm")))

  /**
   * Per-group quota capping: keep at most `cap` rows per group, by a
   * deterministic ordering — the "at most K documents per domain"
   * curation rule. One shuffle on the group key; rank state O(1).
   */
  def capPerGroup(df: DataFrame, groupCol: String, orderCol: String,
      cap: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap)
      .drop("__rn")
  }
}
