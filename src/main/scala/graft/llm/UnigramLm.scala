package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.UnigramCodec

/**
 * Deterministic unigram-LM tokenizer (the SentencePiece family, Kudo
 * 2018, arXiv:1804.10959) — the OTHER production tokenizer next to
 * [[Bpe]]: instead of replaying an ordered merge list greedily, pick
 * each chunk's minimum-cost segmentation over a piece vocabulary by
 * Viterbi dynamic programming.
 *
 * Reference behavior: the reference counts whitespace tokens only
 * (`server/metrics/metrics.go:35` payload histograms); the tokenizer is
 * part of this engine's training-data surface beyond the reference.
 *
 * Deviation from the float EM original, by design: probabilities are
 * replaced with INTEGER surprisal bits — cost(piece) = bitlen(total) −
 * bitlen(freq) (the q113 `length(bin(n))` discipline) — and soft EM with
 * one-best (hard/Viterbi) EM, so learn, encode and the re-estimation
 * round are exact integer arithmetic the DuckDB oracle replays
 * bit-for-bit. Ties resolve by (cost, piece count, packed segmentation
 * in UTF-8 byte order) — pinned in [[graft.functions.UnigramCodec]].
 *
 * Scale shape (the 100 TB story):
 *  - LEARN runs on the chunk-TYPE histogram, not the corpus: one
 *    map-side-combined hash aggregate collapses the corpus to distinct
 *    `chunkLen`-code-point chunks (bounded by vocabulary × chunking, not
 *    data volume — the [[Bpe.PreTok.chunked]] argument), candidate
 *    substring enumeration is a per-row array expression over that
 *    compact frame, and vocabulary selection is ONE distributed top-V
 *    (`orderBy.limit` = TakeOrderedAndProject — no single-partition
 *    window). Only the final model-sized vocabulary is collected.
 *  - ENCODE is a pure per-row codegen'd expression ([[UnigramCodec]]):
 *    the vocabulary rides the closure as one reference object, so token
 *    counting is scan-stage — no join, no shuffle, nothing collected.
 *  - RE-ESTIMATION (hard-EM) counts piece usage over the chunk-type
 *    histogram too — each distinct chunk Viterbi-segments once and
 *    contributes its corpus count to every piece it uses (the
 *    [[Bpe.mergeUtilization]] pattern).
 *
 * Chunking doubles as the oracle-tractability bound: every pre-token is
 * ≤ `chunkLen` code points, so the oracle's DP unrolls to a FIXED CTE
 * chain of `chunkLen` steps regardless of corpus (and CJK text gets the
 * same bounded-histogram robustness as the BPE chunked mode).
 */
object UnigramLm {

  /** Separator between pieces in the packed segmentation. Must not occur
    * inside any corpus chunk — [[learnVocab]] asserts this on the
    * histogram (same contract as [[Bpe.Sep]]). */
  val Sep = "~"

  /** One vocabulary entry: `piece` seen with weighted corpus substring
    * frequency `freq`, Viterbi cost `cost` integer surprisal bits. */
  final case class Piece(piece: String, freq: Long, cost: Long)

  /** Integer bit length: bitlen(0) = 1 (= `length(bin(0))` — both
    * engines render "0"), else position of the highest set bit. */
  private[llm] def bitlen(n: Long): Long =
    if (n <= 0L) 1L else (64 - java.lang.Long.numberOfLeadingZeros(n)).toLong

  /** Chunk-TYPE histogram: (word, cnt) over `chunkLen`-code-point chunks
    * of whitespace words. The one corpus-sized aggregate in the learn
    * path. */
  def chunkHistogram(docs: DataFrame, chunkLen: Int): DataFrame =
    docs.select(explode(Bpe.chunkWords(col("text"), chunkLen)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** All substrings of `word` up to `maxPieceLen` code points, with
    * per-occurrence multiplicity — a pure per-row array expression. */
  private def allSubstrings(word: Column, maxPieceLen: Int): Column =
    flatten(transform(sequence(lit(1), length(word)), s =>
      transform(sequence(lit(1), least(lit(maxPieceLen), length(word) - s + 1)),
        l => word.substr(s, l))))

  /**
   * Learn the vocabulary: all single code points of the corpus (coverage
   * can never fail) plus the top `vocabSize` multi-code-point substrings
   * by (weighted frequency DESC, piece ASC) among those with freq ≥
   * `minCount`. Costs are integer surprisal bits against the selected
   * vocabulary's total mass. Returned sorted by piece (deterministic
   * model order).
   */
  def learnVocab(docs: DataFrame, chunkLen: Int = 6, maxPieceLen: Int = 3,
      minCount: Long = 3L, vocabSize: Int = 40): Seq[Piece] =
    learnVocabLadder(docs, chunkLen, maxPieceLen, minCount,
      Seq(vocabSize))(vocabSize)

  /**
   * [[learnVocab]] at several multi-piece budgets from ONE candidate
   * pass — the vocabulary-SIZING curve (q214's prefix-ladder argument
   * for the unigram family, where a smaller vocabulary is not a prefix:
   * costs are global functions of the selected total, so every rung
   * re-selects and re-prices — but candidate enumeration, the only
   * corpus-histogram-sized work, is shared and checkpointed; each rung
   * is then one distributed top-V over the compact candidate frame).
   */
  def learnVocabLadder(docs: DataFrame, chunkLen: Int = 6,
      maxPieceLen: Int = 3, minCount: Long = 3L,
      rungs: Seq[Int]): Map[Int, Seq[Piece]] = {
    val hist = chunkHistogram(docs, chunkLen).localCheckpoint(true)
    require(hist.filter(col("word").contains(Sep)).head(1).isEmpty,
      s"unigram separator '$Sep' occurs inside a corpus chunk")
    val cand = hist
      .select(col("cnt"),
        explode(allSubstrings(col("word"), maxPieceLen)).as("piece"))
      .groupBy("piece").agg(sum(col("cnt")).as("freq"))
      .localCheckpoint(true)
    val sing = cand.filter(length(col("piece")) === 1).collect()
    val multiAll = cand
      .filter(length(col("piece")) >= 2 && col("freq") >= minCount)
    rungs.map { v =>
      val rows = sing ++ multiAll
        .orderBy(col("freq").desc, col("piece")).limit(v).collect()
      val tot = rows.map(_.getLong(1)).sum
      v -> rows.map { r =>
        val f = r.getLong(1)
        Piece(r.getString(0), f, bitlen(tot) - bitlen(f))
      }.sortBy(_.piece)(graft.llm.Bpe.utf8Ordering).toSeq
    }.toMap
  }

  /** [[learnVocab]] as a DataFrame (piece, freq, cost) — the
    * registry-facing vocabulary table. */
  def learnVocabDf(docs: DataFrame, chunkLen: Int = 6, maxPieceLen: Int = 3,
      minCount: Long = 3L, vocabSize: Int = 40): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    learnVocab(docs, chunkLen, maxPieceLen, minCount, vocabSize)
      .toDF("piece", "freq", "cost")
  }

  /** The codec for [[tokenCount]]/[[tokens]]: vocabulary baked into one
    * serializable reference object. The unknown-single-code-point cost
    * is cost(freq = 0) = bitlen(total) − 1 under the same formula. */
  def codecOf(pieces: Seq[Piece], chunkLen: Int = 6,
      maxPieceLen: Int = 3): UnigramCodec = {
    val tot = pieces.map(_.freq).sum
    new UnigramCodec(pieces.map(_.piece).toArray, pieces.map(_.cost).toArray,
      chunkLen, maxPieceLen, bitlen(tot) - 1L)
  }

  /** Viterbi token count of a document — a pure per-row codegen'd
    * expression ([[graft.functions.UnigramCountExpr]]). */
  def tokenCount(text: Column, codec: UnigramCodec): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{exprOf, ofExpr}
    ofExpr(graft.functions.UnigramCountExpr(
      exprOf(coalesce(text, lit(""))), codec))
  }

  /** The document's full Viterbi token stream (document order,
    * multiplicity kept) as one native array expression. */
  def tokens(text: Column, codec: UnigramCodec): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{exprOf, ofExpr}
    ofExpr(graft.functions.UnigramTokensExpr(
      exprOf(coalesce(text, lit(""))), codec))
  }

  /** Number of chunks a document pre-tokenizes into — the fertility
    * denominator ([[Bpe.chunkWords]] count as a long). */
  def chunkCount(text: Column, chunkLen: Int): Column =
    size(Bpe.chunkWords(coalesce(text, lit("")), chunkLen)).cast("long")

  /**
   * ONE hard-EM round: Viterbi-segment the chunk-type histogram under
   * `pieces`' costs, count weighted piece usage, and re-cost the SAME
   * piece set against the usage totals (fixed support — a piece never
   * used gets cost(0), effectively pruning it without breaking single-
   * code-point coverage). Returns (piece, n_uses as freq, new cost)
   * sorted by piece.
   */
  def reestimate(docs: DataFrame, pieces: Seq[Piece], chunkLen: Int = 6,
      maxPieceLen: Int = 3): Seq[Piece] = {
    val codec = codecOf(pieces, chunkLen, maxPieceLen)
    val usage = chunkHistogram(docs, chunkLen)
      .select(col("cnt"), explode(tokens(col("word"), codec)).as("piece"))
      .groupBy("piece").agg(sum(col("cnt")).as("n_uses"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val tot = usage.valuesIterator.sum
    pieces.map { p =>
      val u = usage.getOrElse(p.piece, 0L)
      Piece(p.piece, u, bitlen(tot) - bitlen(u))
    }.sortBy(_.piece)(graft.llm.Bpe.utf8Ordering)
  }

  /** [[reestimate]] as a DataFrame (piece, n_uses, cost). */
  def reestimateDf(docs: DataFrame, pieces: Seq[Piece], chunkLen: Int = 6,
      maxPieceLen: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    reestimate(docs, pieces, chunkLen, maxPieceLen)
      .toDF("piece", "n_uses", "cost")
  }
}
