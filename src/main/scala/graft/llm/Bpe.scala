package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic byte-pair-encoding: vocabulary construction by iterative
 * greedy merges over the word-TYPE histogram, and a scan-stage encoder
 * that applies the learned merges per word — so downstream budget
 * operators ([[TextAnalysis.packSequencesBy]],
 * [[TextAnalysis.mixtureSampleTokensBy]]) count REAL subword tokens
 * instead of whitespace words.
 *
 * Reference behavior: the reference counts payload sizes and whitespace
 * tokens only (`server/metrics/metrics.go:35` payload histograms); the
 * tokenizer is part of this engine's training-data surface beyond the
 * reference, shaped after the public BPE algorithm (Sennrich et al. 2016,
 * arXiv:1508.07909): learn on word types weighted by frequency, encode by
 * replaying the ordered merge list greedily left-to-right within each
 * word.
 *
 * Scale shape (the 100 TB story):
 *  - LEARN runs on the word-type histogram, not the corpus: one
 *    map-side-combined hash aggregate collapses the corpus to distinct
 *    words (≪ corpus size; bounded by vocabulary, not data volume), and
 *    every merge round after that is a job over that compact frame —
 *    adjacent-pair counts are a map-side-combined aggregate on pair keys,
 *    and only the single argmax row is collected per round (the same
 *    1-row-driver-probe pattern as the q71 Lloyd rounds). The histogram
 *    is localCheckpoint'ed so rounds never rescan the corpus.
 *  - ENCODE is a pure per-row expression (nested higher-order folds, no
 *    UDF): the K merges are baked into the expression as literals, so
 *    token counting is scan-stage — no join against a vocabulary table,
 *    no shuffle, nothing collected. A 1000-executor scan stays a scan.
 *
 * Determinism: pair counts are exact integers; the argmax tie-breaks on
 * (count DESC, lhs ASC, rhs ASC); merge application is a left fold whose
 * single-pass greedy semantics the DuckDB oracle replays with the same
 * fold (`list_reduce`) — bit-identical across engines, no floats anywhere.
 */
object Bpe {

  /** Separator between symbols in the packed tokenization string. Must
    * not occur inside any corpus word — [[learnMerges]] asserts this on
    * the word histogram (one early-exit probe over the compact frame). */
  val Sep = "~"

  /** One learned merge: at `rank`, adjacent symbol pair (lhs, rhs) —
    * weighted corpus count `cnt` — fuses into symbol `merged`. */
  final case class Merge(rank: Int, lhs: String, rhs: String,
      merged: String, cnt: Long)

  private def wordsNonEmpty(text: Column): Column =
    filter(TextFunctions.words(text), w => w =!= "")

  /** Word-TYPE histogram: (word, cnt) over non-empty whitespace tokens.
    * The one corpus-sized aggregate in the learn path. */
  def wordHistogram(docs: DataFrame): DataFrame =
    docs.select(explode(wordsNonEmpty(coalesce(col("text"), lit(""))))
        .as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Initial tokenization of a word: its characters joined by [[Sep]]. */
  private def charToks(word: Column): Column =
    array_join(filter(split(word, ""), c => c =!= ""), Sep)

  /**
   * One merge applied to a packed tokenization, greedy left-to-right in
   * a single pass, as a left fold: if the accumulator's LAST symbol is
   * `lhs` and the next symbol is `rhs`, appending `rhs` directly (no
   * separator) fuses them into one `lhs+rhs` symbol; otherwise the next
   * symbol is appended behind a separator. The fold IS single-pass
   * greedy: a just-fused symbol `lhs+rhs` can never equal `lhs` (rhs is
   * non-empty), so chains never re-merge within the round — the exact
   * semantics `list_reduce` replays on the oracle side (its no-init
   * reduce seeds with the first element; the empty-string sentinel here
   * is equivalent, because no symbol is ever empty).
   *
   * CRITICAL expression-shape constraint: `toks` is referenced exactly
   * ONCE. [[encodeWord]] nests K of these folds, and Catalyst expands
   * every reference to a child expression — a version of this fold that
   * read the split array four times (slice + element_at + size) made the
   * nested encoder tree grow 4^K nodes and hung query planning outright
   * at K = 10. The sentinel-init fold keeps the tree linear in K.
   */
  def applyMerge(toks: Column, lhs: String, rhs: String): Column =
    aggregate(split(toks, Sep), lit(""),
      (acc, x) =>
        when(acc === lit(""), x)
          .when(x === lit(rhs) &&
              (acc === lit(lhs) || acc.endsWith(Sep + lhs)),
            concat(acc, x))
          .otherwise(concat(acc, lit(Sep), x)))

  /** Adjacent-pair counts over the word-type frame, weighted by word
    * frequency — a map-side-combined hash aggregate on (lhs, rhs). */
  private def pairCounts(wordToks: DataFrame): DataFrame = {
    val arr = split(col("toks"), Sep)
    wordToks.filter(size(arr) >= 2)
      .select(col("cnt"),
        explode(transform(sequence(lit(0), size(arr) - 2), i =>
          struct(element_at(arr, i + 1).as("lhs"),
            element_at(arr, i + 2).as("rhs")))).as("p"))
      .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .agg(sum(col("cnt")).as("c"))
  }

  /**
   * Learn `k` ordered merges. Each round: pair counts over the word-type
   * frame, ONE argmax row collected (count DESC, lhs, rhs), the merge
   * folded into every word's tokenization. Stops early if no adjacent
   * pair remains (every word fully fused). `checkpointEvery` bounds the
   * lineage of the iterated frame exactly like duplicateClusters' rounds.
   */
  def learnMerges(docs: DataFrame, k: Int,
      checkpointEvery: Int = 4): Seq[Merge] = {
    var cur = wordHistogram(docs)
      .withColumn("toks", charToks(col("word")))
      .localCheckpoint()
    require(cur.filter(col("word").contains(Sep)).head(1).isEmpty,
      s"BPE separator '$Sep' occurs inside a corpus word")
    val out = Vector.newBuilder[Merge]
    var r = 1
    var exhausted = false
    while (r <= k && !exhausted) {
      pairCounts(cur)
        .orderBy(col("c").desc, col("lhs"), col("rhs"))
        .limit(1).collect() match {
        case Array(row) =>
          val (lhs, rhs) = (row.getString(0), row.getString(1))
          out += Merge(r, lhs, rhs, lhs + rhs, row.getLong(2))
          cur = cur.withColumn("toks", applyMerge(col("toks"), lhs, rhs))
          if (r % checkpointEvery == 0) cur = cur.localCheckpoint()
          r += 1
        case _ => exhausted = true
      }
    }
    out.result()
  }

  /** [[learnMerges]] as a DataFrame (rank, lhs, rhs, merged, cnt) — the
    * registry-facing vocabulary table. */
  def learnBpe(docs: DataFrame, k: Int): DataFrame = {
    val ms = learnMerges(docs, k)
    docs.sparkSession.createDataFrame(ms)
      .select(col("rank"), col("lhs"), col("rhs"), col("merged"), col("cnt"))
  }

  /** Packed tokenization of one word after the ordered merges — the
    * merge list is baked in as literals (scan-stage, no join). */
  def encodeWord(word: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(charToks(word)) { (t, m) => applyMerge(t, m.lhs, m.rhs) }

  /** Real token count of a document under the learned merges — a pure
    * per-row expression, evaluated by the native
    * [[graft.functions.BpeCountExpr]] (one tight codegen'd loop; the
    * K-nested HOF formulation costs ~4 s per sf0.1 evaluation — it was
    * the entire q109/q110 budget-pass cost). [[tokenCountHof]] keeps the
    * fold formulation for the ≡ spec pin. */
  def tokenCount(text: Column, merges: Seq[Merge]): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{exprOf, ofExpr}
    ofExpr(graft.functions.BpeCountExpr(
      exprOf(coalesce(text, lit(""))), merges.map(m => (m.lhs, m.rhs))))
  }

  /** The higher-order-function formulation of [[tokenCount]] (outer fold
    * over words, inner folds per merge) — semantically identical,
    * BpeSpec-pinned ≡ the native expression. */
  private[graft] def tokenCountHof(text: Column, merges: Seq[Merge]): Column =
    aggregate(wordsNonEmpty(coalesce(text, lit(""))), lit(0L),
      (acc, w) => acc +
        size(split(encodeWord(w, merges), Sep)).cast("long"))

  /** The document's full token stream (document order, multiplicity
    * kept) as ONE native array expression ([[graft.functions
    * .BpeTokensExpr]] — the collecting sibling of [[tokenCount]]'s
    * counter; both share one per-word loop). The HOF formulation below
    * is the ≡ spec pin; interpreted it cost ~4.5 s per sf0.1 pass. */
  def tokens(text: Column, merges: Seq[Merge]): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{exprOf, ofExpr}
    ofExpr(graft.functions.BpeTokensExpr(
      exprOf(coalesce(text, lit(""))), merges.map(m => (m.lhs, m.rhs))))
  }

  /** Exploded token stream (doc_id, pos, token) in document order — the
    * long-format encoder output downstream featurizers consume. */
  def encodeTokens(docs: DataFrame, merges: Seq[Merge]): DataFrame =
    docs.select(col("doc_id"),
      posexplode(tokens(col("text"), merges)))
      .toDF("doc_id", "pos", "token")

  /** The higher-order-function formulation of [[encodeTokens]] (outer
    * transform over words, K nested folds per word) — semantically
    * identical, BpeSpec-pinned ≡ the native expression. */
  private[graft] def encodeTokensHof(docs: DataFrame,
      merges: Seq[Merge]): DataFrame =
    docs.select(col("doc_id"),
      posexplode(flatten(transform(
        wordsNonEmpty(coalesce(col("text"), lit(""))),
        w => split(encodeWord(w, merges), Sep)))))
      .toDF("doc_id", "pos", "token")

  /** Per-word packed tokenizations in document order — the
    * boundary-PRESERVING encoder output that [[decode]] inverts. The
    * flat stream ([[tokens]] / [[encodeTokens]]) deliberately drops word
    * boundaries (downstream featurizers consume a token sequence, the
    * standard export shape); this form keeps each word's packed
    * `[[Sep]]`-separated tokenization as one element, so the document is
    * reconstructible. Scan-stage like every encode path. */
  def encodeWords(text: Column, merges: Seq[Merge]): Column =
    transform(wordsNonEmpty(coalesce(text, lit(""))),
      w => encodeWord(w, merges))

  /** Inverse of [[encodeWords]]: strip each word's intra-word
    * separators, re-join words with single spaces. `decode ∘
    * encodeWords ≡` the document's space-joined non-empty words — the
    * tokenizer roundtrip. Merge application only MOVES separators
    * (never characters), so any failure of this identity localizes to
    * the artifact boundary: a drifted/torn stored vocabulary, or a
    * native-expression encode loop that dropped or reordered content —
    * exactly what the q144 registry check and the BpeSpec roundtrip pin
    * (incl. non-BMP text) watch for. [[Sep]] is a single char, so the
    * strip is a codegen'd `translate`. */
  def decode(encoded: Column): Column =
    array_join(transform(encoded, p => translate(p, Sep, "")), " ")

  /**
   * Merge (vocabulary) utilization on a corpus: per learned merge, how
   * many tokens of the encoded stream ARE that merge's output symbol,
   * plus its share of the whole stream in truncating permille. A merge
   * whose `n_uses` reads 0 is a dead vocabulary entry on this corpus —
   * its pair was always absorbed by a later, larger merge — which is
   * the tokenizer-sizing signal next to coverage (how much mass the top
   * slots carry) and fertility (tokens per word): coverage and
   * fertility say whether the vocabulary is big enough; this says
   * whether the slots already spent are EARNING anything.
   *
   * Scale shape: the count runs over the word-TYPE histogram, never the
   * corpus stream — each distinct word encodes once and contributes its
   * corpus count to every token it splits into (the [[tokenCount]]
   * pattern), so the one corpus-sized aggregate is the histogram build;
   * the vocabulary side is `merges.size` rows broadcast onto the tiny
   * token-count table.
   */
  def mergeUtilization(docs: DataFrame, merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab = merges.map(m => (m.rank.toLong, m.merged))
      .toDF("rank", "tok")
    val counts = wordHistogram(docs)
      .select(col("cnt"),
        explode(split(encodeWord(col("word"), merges), Sep)).as("tok"))
      .groupBy("tok").agg(sum(col("cnt")).as("n_uses"))
    val tot = counts.agg(coalesce(sum(col("n_uses")), lit(0L)).as("t"))
    broadcast(vocab).join(counts, Seq("tok"), "left")
      .crossJoin(broadcast(tot))
      .select(col("rank"), col("tok"),
        coalesce(col("n_uses"), lit(0L)).as("n_uses"),
        expr("coalesce(n_uses, 0) * 1000 div greatest(t, 1)")
          .as("stream_permille"))
  }
}
