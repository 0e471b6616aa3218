package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Learned quality-classifier gate — the "fasttext gate" shape of
 * large-scale pretraining pipelines (train a cheap model to mimic an
 * expensive/reference quality signal, then gate the corpus with the model
 * at scan speed). The reference engine carries no ML surface (its scope
 * ends at ingest/metrics — `server/app/app.go`, `server/metrics/
 * metrics.go`); this operator belongs to the training-data surface this
 * engine adds on top.
 *
 * Model: nearest-centroid over integer-scaled text statistics. Training
 * is a closed-form single aggregate (per-class feature sums + counts —
 * one map-side-combined pass, one result row), so the "fit" is
 * deterministic and cross-engine reproducible — no SGD, no float
 * accumulation order. Classification compares cross-multiplied L1
 * distances in exact integer arithmetic:
 *
 *   pred = 1  ⇔  c_neg · Σᵢ |fᵢ·c_pos − sᵢ,pos|  ≤  c_pos · Σᵢ |fᵢ·c_neg − sᵢ,neg|
 *
 * (multiplying through by the class counts clears the centroid divisions
 * sᵢ/c, so both sides stay integers; ties predict positive). All products
 * run in DECIMAL(38,0) — with fᵢ ≤ 10¹⁰ and class counts ≤ 10¹², the
 * worst side is 5·f·c² ≤ 5·10³⁴ < 10³⁸, exact on both engines (DuckDB
 * mirrors in HUGEINT; int128 caps at 1.7·10³⁸).
 *
 * Scale shape: the trained centroids are ONE broadcast row
 * (crossJoin(broadcast(...)) — never collected to the driver), and the
 * per-doc feature extraction + distance compare is scan-stage expression
 * work. On 10¹² docs the whole gate is: one aggregate pass to train, one
 * scan to classify, zero shuffles of the corpus.
 */
object Classifier {

  /** Ratio scale: 4 decimal digits as exact integer units. */
  private val Sc = 10000L

  /**
   * Integer-scaled per-doc features, all BIGINT-exact (`DIV` — truncating
   * integer division on non-negative longs, mirrored by DuckDB's `//`):
   *   f1 n_words        non-empty whitespace tokens
   *   f2 n_chars        length(text)
   *   f3 ttr·10⁴        distinct tokens / raw tokens (q37's denominator)
   *   f4 stop·10⁴       stopword tokens / raw tokens
   *   f5 wordlen·10⁴    non-space chars / non-empty words
   * Raw-token stats (n_raw/n_distinct/n_stop) ride along for teacher
   * expressions. Null text classifies as empty ("" — split yields [""],
   * n_raw = 1) rather than poisoning split() into size −1.
   */
  private[llm] def withFeatures(docs: DataFrame,
      tok: DedupOps.Tokenizer = DedupOps.Tokenizer.Ascii): DataFrame = {
    // Under the Unicode tokenizer every feature (including the char
    // lengths f2/f5) reads the NORMALIZED surface — the surface the
    // stopword/TTR statistics are meaningful on for non-Latin text; the
    // Ascii default is the raw surface every stored model and oracle
    // hash was trained on. A model is only valid against batches scored
    // under the SAME tokenizer (the [[ClassifierIndex]] invariant).
    val text = tok.prep(coalesce(col("text"), lit("")))
    val raw = TextFunctions.words(text)
    val nonEmpty = filter(raw, w => w =!= "")
    val allStops = array(
      TextAnalysis.stopwords.flatMap(_._2).distinct.map(lit): _*)
    docs
      .withColumn("n_raw", size(raw).cast("long"))
      .withColumn("n_distinct", size(array_distinct(raw)).cast("long"))
      .withColumn("n_stop",
        size(filter(raw, w => array_contains(allStops, w))).cast("long"))
      .withColumn("n_nospace",
        length(regexp_replace(text, " ", "")).cast("long"))
      .withColumn("f1", size(nonEmpty).cast("long"))
      .withColumn("f2", length(text).cast("long"))
      .withColumn("f3", expr(s"n_distinct * $Sc DIV n_raw"))
      .withColumn("f4", expr(s"n_stop * $Sc DIV n_raw"))
      .withColumn("f5", expr(s"n_nospace * $Sc DIV greatest(f1, 1L)"))
  }

  private val featCols = (1 to 5).map(i => s"f$i")

  /** The feature-column list as data — [[ClassifierIndex]] derives its
    * stored-model column set (and content signature) from this, so the
    * two cannot drift. */
  private[llm] def featColNames: Seq[String] = featCols

  /**
   * Train on `teacher` (any deterministic boolean over the doc row — it
   * may reference the [[withFeatures]] stat columns) and classify every
   * doc. Output: (doc_id, label, pred, agree) — label is the teacher's
   * verdict, pred the student's, both 0/1 INTs. Degenerate classes fall
   * back loudly-simple: an empty positive class predicts 0 everywhere, an
   * empty negative class 1 everywhere (the cross-multiply would otherwise
   * compare 0 ≤ 0 and claim everything positive).
   */
  def centroidGate(docs: DataFrame, teacher: Column,
      tok: DedupOps.Tokenizer = DedupOps.Tokenizer.Ascii): DataFrame = {
    val feats = withFeatures(docs, tok)
      .withColumn("label", teacher.cast("int"))
    feats.crossJoin(broadcast(centroidsOf(feats)))
      .withColumn("pred", predExpr)
      .select(col("doc_id"), col("label"),
        col("pred"), (col("label") === col("pred")).cast("int").as("agree"))
  }

  /** The trained model: ONE row of class counts and per-feature class
    * sums — the broadcast artifact [[ClassifierIndex]] persists. Input
    * must carry [[withFeatures]]' stat columns plus an int `label`. */
  private[llm] def centroidsOf(feats: DataFrame): DataFrame = {
    val centCols =
      sum(when(col("label") === 1, 1L).otherwise(0L)).as("c_pos") +:
        sum(when(col("label") === 0, 1L).otherwise(0L)).as("c_neg") +:
        featCols.flatMap(f => Seq(
          sum(when(col("label") === 1, col(f)).otherwise(0L)).as(s"sp_$f"),
          sum(when(col("label") === 0, col(f)).otherwise(0L)).as(s"sn_$f")))
    feats.agg(centCols.head, centCols.tail: _*)
  }

  /** The student's verdict over a row carrying both the feature and the
    * model (centroid) columns — Σ|f·c − s| cross-multiplied distances in
    * DECIMAL(38,0), degenerate classes loudly-simple. */
  private[llm] def predExpr: Column = {
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    def dist(cnt: String, pfx: String): Column =
      featCols.map(f =>
        abs(dec(col(f)) * dec(col(cnt)) - dec(col(s"${pfx}_$f"))))
        .reduce(_ + _)
    when(col("c_pos") === 0, lit(0))
      .when(col("c_neg") === 0, lit(1))
      .when(dec(col("c_neg")) * dist("c_pos", "sp") <=
        dec(col("c_pos")) * dist("c_neg", "sn"), lit(1))
      .otherwise(lit(0))
  }

  /**
   * Calibration/reliability report of the student against the teacher's
   * CONTINUOUS score axis: documents bucket by the integer-scaled
   * teacher quality score (`qs` ∈ [0, 10⁴] — q37's blend, fround'd to 4
   * decimals then scaled), and each bucket reports how often the
   * teacher and the student call it positive. A well-behaved student
   * flips from all-negative buckets to all-positive buckets around the
   * teacher threshold with a narrow mixed band; a wide mixed band (or
   * flipping far from the threshold) is the retrain signal. q166's AUC
   * summarizes ranking skill in one number — this is the curve a gate
   * owner reads before trusting the cut, bucket by bucket.
   *
   * Every count is an exact integer; the one double
   * (`pred_pos_frac`) is a fround'd ratio of two of them. Shape:
   * [[centroidGate]]'s single training aggregate + broadcast-model
   * scan, then ONE bucket-keyed map-side-combined aggregate
   * (≤ `buckets` result rows).
   */
  def calibrationReport(docs: DataFrame, threshold: Double = 0.5,
      buckets: Int = 10,
      tok: DedupOps.Tokenizer = DedupOps.Tokenizer.Ascii): DataFrame = {
    require(buckets > 0, "calibrationReport needs at least one bucket")
    val q = qualityBlend
    val feats = withFeatures(docs, tok)
      .withColumn("label", qualityTeacher(threshold).cast("int"))
      .withColumn("qs",
        coalesce(floor(q * 10000d + lit(0.5)).cast("long"), lit(0L)))
    feats.crossJoin(broadcast(centroidsOf(feats)))
      .withColumn("pred", predExpr)
      .withColumn("bucket",
        least(expr(s"qs * $buckets div 10000"), lit(buckets - 1L)))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("label").cast("long")).as("n_label_pos"),
        sum(col("pred").cast("long")).as("n_pred_pos"),
        sum((col("label") === col("pred")).cast("long")).as("n_agree"))
      .withColumn("pred_pos_frac",
        TextFunctions.fround(
          col("n_pred_pos").cast("double") / col("n_docs"), 4))
  }

  /** The q37 heuristic blend as the teacher: quality ≥ `threshold`,
    * computed INLINE over [[withFeatures]]'s raw-token stats (same
    * expression order as `TextAnalysis.qualityScore`, already hash-pinned
    * by q37) — no join back to the scored frame, the corpus scans once. */
  def qualityTeacherGate(docs: DataFrame,
      threshold: Double = 0.5,
      tok: DedupOps.Tokenizer = DedupOps.Tokenizer.Ascii): DataFrame =
    centroidGate(docs, qualityTeacher(threshold), tok)

  /** The q37 heuristic quality blend over [[withFeatures]]' raw-token
    * stats — delegates to [[TextAnalysis.qualityBlendOf]], the ONE
    * formula the teacher threshold ([[qualityTeacher]]), the
    * calibration bucket axis ([[calibrationReport]]),
    * [[TextAnalysis.qualityScore]] and [[TextAnalysis.annealedOrder]]
    * all read, so none can drift. */
  private def qualityBlend: Column =
    TextAnalysis.qualityBlendOf(col("n_raw"), col("n_distinct"),
      col("n_stop"))

  /** The q37 heuristic blend as a reusable teacher column (over
    * [[withFeatures]]' stat columns). */
  private[llm] def qualityTeacher(threshold: Double): Column =
    qualityBlend >= threshold
}
