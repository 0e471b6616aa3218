package graft

import graft.llm.{Classifier, Retrieval, TextAnalysis}
import graft.llm.DedupOps.Tokenizer
import org.apache.spark.sql.functions._

/**
 * The multilingual contract of the SELECTION stack (term statistics,
 * bigram surprisal, DSIR, Gopher rules, the classifier gate) under the
 * [[graft.llm.DedupOps.Tokenizer]] knob — UnicodeTextSpec's companion:
 * round 14 threaded the tokenizer through dedup + winnowing, this pins
 * that the QUALITY/selection operators stop misreading non-Latin text
 * under `Tokenizer.Unicode` while `Tokenizer.Ascii` (the default every
 * oracle hash rides on) keeps the historical raw-surface behavior.
 * These claims need NON-ASCII fixtures, which the DuckDB-checked
 * registry corpus (ASCII by design) cannot see.
 */
class MultilingualSelectionSpec extends SparkSpec {
  import spark.implicits._

  // doc 2 is doc 1 modulo case + punctuation; doc 3 shares nothing
  private lazy val ru = Seq(
    (1L, "Привет, мир! Это тестовый документ."),
    (2L, "привет мир это тестовый документ"),
    (3L, "совершенно другой набор русских слов")
  ).toDF("doc_id", "text")

  private lazy val cleanTrain =
    Seq((10L, "привет мир это тестовый документ")).toDF("doc_id", "text")

  test("termCounts: Unicode tokenizer merges case/punct variants of a non-Latin term") {
    // Ascii surface: "Привет," (capital + comma) is a different raw
    // token than "привет" — only doc 2 counts
    val ascii = Retrieval.termCounts(ru, Tokenizer.Ascii)
      .filter(col("term") === "привет").select("doc_id").as[Long].collect()
    assert(ascii.toSet === Set(2L))
    val uni = Retrieval.termCounts(ru, Tokenizer.Unicode)
      .filter(col("term") === "привет").select("doc_id").as[Long].collect()
    assert(uni.toSet === Set(1L, 2L))
  }

  test("bigramSurprisal: a case/punct clone of the train slice reads in-model only under Unicode") {
    def bits(tok: Tokenizer): Map[Long, (Long, Long)] =
      Retrieval.bigramSurprisal(ru, cleanTrain, tok = tok)
        .select("doc_id", "n_bigrams", "surprisal_bits")
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
    val uni = bits(Tokenizer.Unicode)
    val ascii = bits(Tokenizer.Ascii)
    // same bigram count either way (punctuation rides inside tokens on
    // the raw surface, it does not create or destroy word boundaries here)
    assert(uni(1L)._1 === 4L && ascii(1L)._1 === 4L)
    // Unicode: every doc-1 bigram is a seen (c_xy=1, c_x=1) model entry →
    // 1 bit each; identical to the byte-clean clone's cost
    assert(uni(1L)._2 === 4L)
    assert(uni(1L) === uni(2L))
    // Ascii: the punctuated bigrams are all UNSEEN → bitlen(V)−1 = 2 bits
    // each — the silent quality-gate misread the tokenizer knob fixes
    assert(ascii(1L)._2 === 8L)
  }

  test("dsirScores: the normalized clone is exactly as target-like as clean text under Unicode") {
    def lr(tok: Tokenizer): Map[Long, Long] =
      Retrieval.dsirScores(ru, cleanTrain, buckets = 1024, tok = tok)
        .select("doc_id", "lr_scaled").as[(Long, Long)].collect().toMap
    val uni = lr(Tokenizer.Unicode)
    assert(uni(1L) === uni(2L))
    assert(uni(1L) > uni(3L))
    // raw surface: the punctuated clone's hashed bigrams miss the target
    // bins, so it reads LESS target-like than its own content warrants
    val ascii = lr(Tokenizer.Ascii)
    assert(ascii(1L) < uni(1L))
  }

  test("gopherRules: non-Latin docs pass alpha + required-word gates only under Unicode") {
    def row(tok: Tokenizer) = TextAnalysis.gopherRules(ru,
      minWords = 3L, maxWords = 100L,
      requiredWords = Seq("привет", "мир"), minRequiredHits = 1, tok = tok)
      .filter(col("doc_id") === 1L).head()
    val a = row(Tokenizer.Ascii)
    // [a-zA-Z] never matches Cyrillic → the alpha gate rejects wholesale,
    // and "Привет," ≠ "привет" defeats the required-word gate
    assert(!a.getAs[Boolean]("ok_alpha_words"))
    assert(!a.getAs[Boolean]("ok_required_words"))
    val u = row(Tokenizer.Unicode)
    assert(u.getAs[Boolean]("ok_alpha_words"))
    assert(u.getAs[Boolean]("ok_required_words"))
    assert(u.getAs[Boolean]("keep"))
  }

  test("gopherRules: symbol counts stay on the RAW surface under Unicode") {
    // normalization deletes '#' and '...' by construction — a normalized
    // symbol count would always read 0 and the gate would never fire
    val spam = Seq((1L, "счёт ### номер ### один ### два ### три ### раз"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.gopherRules(spam, minWords = 1L, maxWords = 100L,
      requiredWords = Seq("счёт"), minRequiredHits = 1,
      tok = Tokenizer.Unicode).head()
    assert(r.getAs[Long]("n_symbols") === 15L)
    assert(!r.getAs[Boolean]("ok_symbol_ratio"))
  }

  test("classifier gate: the stopword stat sees punctuation-wrapped stopwords only under Unicode") {
    val fr = Seq(
      (1L, "Le, chat! Et. Le; chien?"), // every stopword wrapped in punct
      (2L, "xyz qrs tuv wxy")           // no stopwords either way
    ).toDF("doc_id", "text")
    def labels(tok: Tokenizer): Map[Long, Int] =
      Classifier.centroidGate(fr, col("n_stop") > 0, tok)
        .select("doc_id", "label").as[(Long, Int)].collect().toMap
    val ascii = labels(Tokenizer.Ascii)
    assert(ascii(1L) === 0 && ascii(2L) === 0)
    val uni = labels(Tokenizer.Unicode)
    assert(uni(1L) === 1 && uni(2L) === 0)
  }

  test("Ascii default is byte-for-byte the historical surface on ASCII text") {
    // the no-regression guarantee: on pure-ASCII input with no upper
    // case or punctuation, both tokenizers coincide post-normalization
    val en = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val a = Retrieval.termCounts(en, Tokenizer.Ascii)
      .orderBy("term").as[(Long, String, Long)].collect()
    val u = Retrieval.termCounts(en, Tokenizer.Unicode)
      .orderBy("term").as[(Long, String, Long)].collect()
    assert(a === u)
  }
}
