package graft

import graft.llm.{TextAnalysis, TextFunctions}
import org.apache.spark.sql.functions._

/**
 * The multilingual contract of the unicode-aware text surface
 * (TextFunctions.normalizeUnicode / unicodeWords,
 * TextAnalysis.normalizedUnicode / unicodeDupGroups) — pinned on
 * NON-ASCII fixtures, which the DuckDB oracle (q132, ASCII corpus by
 * design) cannot see. The load-bearing claims: a non-Latin document
 * normalizes non-empty (the ASCII strip would empty it and spuriously
 * merge every such doc), it dedups against its own case/punctuation
 * clone, and DISTINCT non-ASCII texts do not collide.
 */
class UnicodeTextSpec extends SparkSpec {
  import spark.implicits._

  private def norm(s: String): String =
    Seq(s).toDF("text")
      .select(TextFunctions.normalizeUnicode(col("text"))).head.getString(0)

  test("normalizeUnicode: case-folds, strips symbols, collapses whitespace") {
    assert(norm("Hello,  World!") === "hello world")
    assert(norm("  a\t\tb\nc  ") === "a b c")
    assert(norm("Café CAFÉ") === "café café")
    assert(norm("Привет, МИР!") === "привет мир")
    assert(norm("你好，世界！") === "你好世界")
    assert(norm("¡Señor número 1!") === "señor número 1")
    // all-symbol text normalizes to empty, not a crash
    assert(norm("!!! ??? ---") === "")
  }

  test("non-ASCII docs fingerprint non-empty and distinct texts do not collide") {
    val fps = Seq((1L, "Привет, мир!"), (2L, "你好，世界"), (3L, "Grüße aus Köln"))
      .toDF("doc_id", "text")
      .select(TextFunctions.polyHash(
        TextFunctions.normalizeUnicode(col("text"))).as("fp"))
      .as[Long].collect()
    // none collapsed to the empty-string hash (0), all mutually distinct
    assert(fps.forall(_ != 0L))
    assert(fps.distinct.length === 3)
  }

  test("unicodeDupGroups: a non-ASCII doc dedups against its case/punct clone") {
    val corpus = Seq(
      (1L, "Привет, мир!"),
      (2L, "привет мир"), //      clone of 1 modulo case + punctuation
      (3L, "ПРИВЕТ   МИР"), //    clone of 1 modulo case + whitespace runs
      (4L, "Прощай, мир!"), //    different text — must NOT join the group
      (5L, "你好，世界"),
      (6L, "你好、世界！") //      CJK clone modulo punctuation (deleting
      //                         punctuation glues symbols — a SPACED
      //                         variant is a different normalized string
      //                         by design, same as the ASCII normalizer)
    ).toDF("doc_id", "text")
    val got = TextAnalysis.unicodeDupGroups(corpus)
      .orderBy("doc_id")
      .as[(Long, Long, Long)].collect()
    assert(got === Array(
      (1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (4L, 4L, 1L),
      (5L, 5L, 2L), (6L, 5L, 2L)))
  }

  test("unicodeWords tokenizes non-Latin text; the ASCII strip would not") {
    val toks = Seq("Привет, мир!").toDF("text")
      .select(TextFunctions.unicodeWords(col("text"))).head.getSeq[String](0)
    assert(toks === Seq("привет", "мир"))
    // the ASCII normalizer's documented failure mode on the same text
    val ascii = TextAnalysis.normalized(Seq((1L, "Привет, мир!")).toDF("doc_id", "text"))
      .select("text_norm").head.getString(0)
    assert(ascii.trim === "")
  }

  test("unicodeDecontaminated drops case-variant benchmark copies the ASCII gate keeps") {
    val corpus = Seq(
      (1L, "the quick brown fox"),
      (2L, "totally innocent document"),
      (3L, "Привет, мир!")).toDF("doc_id", "text")
    // benchmark carries an UPPERCASED copy of doc 1 and a re-punctuated
    // copy of the non-ASCII doc 3
    val bench = Seq((100L, "THE QUICK BROWN FOX"), (101L, "привет мир"))
      .toDF("doc_id", "text")
    val uni = TextAnalysis.unicodeDecontaminated(corpus, bench)
      .select("doc_id").as[Long].collect().sorted
    assert(uni === Array(2L)) // both contaminated docs dropped
    // the ASCII gate keeps BOTH: capitals are deleted (not folded), so
    // "THE QUICK BROWN FOX" normalizes to spaces-only, and the Russian
    // text normalizes to "" on both sides but doc 3's own side too —
    // matching everything empty — which is exactly why the unicode gate
    // exists. Pin only the case-variant miss here (doc 1 kept).
    val ascii = TextAnalysis.decontaminated(corpus, bench)
      .select("doc_id").as[Long].collect().sorted
    assert(ascii.contains(1L))
  }

  test("near-dup shingle family: non-ASCII clones PAIR under the Unicode tokenizer, never under ASCII") {
    import graft.llm.DedupOps
    // Russian and CJK near-clone pairs (case/punctuation variants), plus
    // an unrelated doc. On the raw (ASCII-tokenizer) surface the clones
    // share too few 3-shingles to reach any threshold — the Russian pair
    // differs in case+punctuation on the boundary tokens (raw Jaccard
    // 4/10 = 0.4), the CJK pair punctuates every token (raw Jaccard 0) —
    // while the Unicode tokenizer normalizes both pairs to IDENTICAL
    // word streams (Jaccard 1.0).
    val docs = Seq(
      (1L, "Привет мир это тестовый документ про оленей и снег"),
      (2L, "привет, мир! это тестовый документ про оленей и снег."),
      (3L, "这是 一个 关于 鹿 和 雪 的 测试 文档 内容 很长"),
      (4L, "这是。 一个。 关于。 鹿。 和。 雪。 的。 测试。 文档。 内容。 很长。"),
      (5L, "totally unrelated english filler document right here"))
      .toDF("doc_id", "text")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // Unicode tokenizer: both clone pairs fire across the whole family
    val uniJacc = ids(DedupOps.ngramJaccardPairs(docs, n = 3,
      threshold = 0.5, tok = DedupOps.Tokenizer.Unicode))
    assert(uniJacc === Set((1L, 2L), (3L, 4L)))
    val uniMh = ids(DedupOps.minhashLshPairs(docs, n = 3, perms = 32,
      bands = 8, rowsPerBand = 4, threshold = 0.5,
      tok = DedupOps.Tokenizer.Unicode))
    assert(uniMh === Set((1L, 2L), (3L, 4L)))
    val uniCont = ids(DedupOps.containmentPairs(docs, n = 3,
      threshold = 0.8, tok = DedupOps.Tokenizer.Unicode))
    assert(uniCont === Set((1L, 2L), (3L, 4L)))
    // ASCII tokenizer: the same clones silently never match
    assert(ids(DedupOps.ngramJaccardPairs(docs, n = 3,
      threshold = 0.5)).isEmpty)
    assert(ids(DedupOps.minhashLshPairs(docs, n = 3, perms = 32,
      bands = 8, rowsPerBand = 4, threshold = 0.5)).isEmpty)
    // and the keep-list composition keeps only the min-id representative
    // of each unicode clone cluster
    val kept = DedupOps.dedupedCorpus(docs,
      DedupOps.duplicateClusters(uniMh.toSeq.toDF("id_a", "id_b")))
      .select("doc_id").as[Long].collect().sorted
    assert(kept === Array(1L, 3L, 5L))
  }

  test("production dedup stack under the Unicode tokenizer: exact stage collapses case variants, near stage pairs punctuation variants") {
    import graft.llm.DedupOps
    val docs = Seq(
      // exact under Unicode (normalized-identical), NOT exact raw
      (1L, "Привет мир это тестовый документ про оленей и снег"),
      (2L, "ПРИВЕТ МИР ЭТО ТЕСТОВЫЙ ДОКУМЕНТ ПРО ОЛЕНЕЙ И СНЕГ"),
      // near-dup under Unicode (boundary punctuation), below raw thresholds
      (3L, "привет, мир! это тестовый документ про оленей и снег."),
      (4L, "totally unrelated english filler document right here"),
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val uni = DedupOps.exactThenNearDedup(docs, n = 3, perms = 32,
      bands = 8, rowsPerBand = 4, threshold = 0.5,
      tok = DedupOps.Tokenizer.Unicode)
      .select("doc_id").as[Long].collect().sorted
    // 2 collapses into 1 at the exact stage, 3 clusters with 1 at the
    // near stage; the null-text row bypasses both
    assert(uni === Array(1L, 4L, 5L))
    // the ASCII stack keeps all three variants — the documented gap
    val ascii = DedupOps.exactThenNearDedup(docs, n = 3, perms = 32,
      bands = 8, rowsPerBand = 4, threshold = 0.5)
      .select("doc_id").as[Long].collect().sorted
    assert(ascii === Array(1L, 2L, 3L, 4L, 5L))
    // incremental append: a case-variant clone of an EXISTING corpus doc
    // is dropped under Unicode, kept under Ascii
    val existing = docs.filter(col("doc_id") === 1L)
    val incoming = Seq(
      (10L, "ПРИВЕТ МИР ЭТО ТЕСТОВЫЙ ДОКУМЕНТ ПРО ОЛЕНЕЙ И СНЕГ"),
      (11L, "genuinely new incoming document")).toDF("doc_id", "text")
    val incUni = DedupOps.incrementalDedup(existing, incoming,
      tok = DedupOps.Tokenizer.Unicode)
      .select("doc_id").as[Long].collect().sorted
    assert(incUni === Array(11L))
    val incAscii = DedupOps.incrementalDedup(existing, incoming)
      .select("doc_id").as[Long].collect().sorted
    assert(incAscii === Array(10L, 11L))
  }

  test("withShingleHashes stamps the tokenizer; a mismatched operator call fails loudly") {
    import graft.llm.DedupOps
    val docs = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val pre = DedupOps.withShingleHashes(docs, n = 3,
      tok = DedupOps.Tokenizer.Unicode)
    val e = intercept[IllegalArgumentException] {
      DedupOps.shingleIndex(pre, n = 3).collect() // default = Ascii
    }
    assert(e.getMessage.contains("tokenizer"))
    // matching tokenizer passes and equals the inline computation
    val viaPre = DedupOps.shingleIndex(pre, n = 3,
      tok = DedupOps.Tokenizer.Unicode).as[(Long, Long)].collect().sorted
    val inline = DedupOps.shingleIndex(docs, n = 3,
      tok = DedupOps.Tokenizer.Unicode).as[(Long, Long)].collect().sorted
    assert(viaPre === inline)
  }

  test("normalizedUnicode: null text normalizes to empty string, row kept") {
    val got = TextAnalysis.normalizedUnicode(
      Seq((1L, null: String), (2L, "Ok!")).toDF("doc_id", "text"))
      .orderBy("doc_id").select("text_norm").as[String].collect()
    assert(got === Array("", "ok"))
  }

  test("winnow decon: embedded non-ASCII benchmark passage flags under Unicode, never under ASCII") {
    import graft.llm.DedupOps
    val passage = "привет мир это тестовый документ про оленей и снег сегодня"
    val corpus = Seq(
      (1L, s"intro words $passage closing words here"),
      (2L, "plain unrelated english filler document content")
    ).toDF("doc_id", "text")
    // same word sequence, but every word case-flipped and punctuated:
    // the ASCII surface shares ZERO shingles with the embedded copy
    val bench = Seq(
      (100L, "Привет, Мир! Это. Тестовый? Документ, Про! Оленей. И? Снег, Сегодня!")
    ).toDF("doc_id", "text")
    val uni = DedupOps.winnowDecontaminate(corpus, bench, n = 3, w = 4,
        minShared = 2L, tok = DedupOps.Tokenizer.Unicode)
      .select("doc_id", "kept").as[(Long, Boolean)].collect().toMap
    assert(uni === Map(1L -> false, 2L -> true))
    val ascii = DedupOps.winnowDecontaminate(corpus, bench, n = 3, w = 4,
        minShared = 2L)
      .select("doc_id", "kept").as[(Long, Boolean)].collect().toMap
    assert(ascii === Map(1L -> true, 2L -> true))
    // attribution names the leaking bench doc under the Unicode tokenizer
    val att = DedupOps.winnowContaminationSources(corpus, bench, n = 3,
        w = 4, minShared = 2L, tok = DedupOps.Tokenizer.Unicode)
      .select("doc_id", "bench_id").as[(Long, Long)].collect().toSet
    assert(att === Set((1L, 100L)))
  }
}
