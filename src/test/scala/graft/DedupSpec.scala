package graft

import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Dedup operator specs — the at-least-once repair contract (B7). */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def dupes = Seq(
    ("a", 1L, "x"), ("a", 1L, "x"),       // exact duplicate
    ("a", 2L, "y"),                        // same key, later ts
    ("b", 5L, "z")
  ).toDF("id", "ts", "payload")

  test("exact dedup collapses identical rows only") {
    val out = Dedup.exact(dupes)
    assert(out.count() === 3)
  }

  test("byKey keeps one row per key") {
    assert(Dedup.byKey(dupes, Seq("id")).count() === 2)
  }

  test("latestByKey deterministically keeps the row sorting last") {
    val out = Dedup.latestByKey(dupes, Seq("id"), Seq(col("ts")))
      .select("id", "ts", "payload").as[(String, Long, String)]
      .collect().sortBy(_._1)
    assert(out.toSeq === Seq(("a", 2L, "y"), ("b", 5L, "z")))
  }

  test("duplicated stream collapses back to the original (README contract)") {
    val events = graft.model.Tables.events(spark, sfDir)
      .withColumn("ts", col("ts").cast("long"))
    val doubled = events.unionAll(events)
    assert(Dedup.exact(doubled).count() === events.count())
  }

  test("DedupOps.exactDedup: min-id representative per verbatim clone group, nulls routed around") {
    val docs = Seq(
      (5L, "a b c"), (2L, "a b c"),            // clones -> keep 2
      (3L, "x y z"),                           // singleton
      (7L, null.asInstanceOf[String]),         // null text kept as-is
      (8L, null.asInstanceOf[String]),         // both nulls survive
      (9L, "")                                 // empty string is its own group
    ).toDF("doc_id", "text")
    val kept = graft.llm.DedupOps.exactDedup(docs)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(2L, 3L, 7L, 8L, 9L))
  }

  test("dupLeakageMatrix: cross-source clones land off-diagonal, canonical pair order") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "web"),
      (2L, "the quick brown fox jumps over the lazy dog", "web"),
      (3L, "the quick brown fox jumps over the lazy dog", "books"),
      (4L, "completely different content entirely unrelated words here", "books")
    ).toDF("doc_id", "text", "source")
    // pairs (1,2) web∩web, (1,3) and (2,3) web∩books — both cross rows
    // canonicalize to (books, web) regardless of id order
    val m = graft.llm.DedupOps.dupLeakageMatrix(docs)
      .select("source_a", "source_b", "n_pairs")
      .as[(String, String, Long)].collect().sortBy(r => (r._1, r._2))
    assert(m.toSeq === Seq(("books", "web", 2L), ("web", "web", 1L)))
  }

  test("levenshtein anchors: Spark computes the textbook DP distances") {
    // The cross-engine contract behind editVerifiedPairs: unit-cost
    // Levenshtein. DuckDB's levenshtein('kitten','sitting') = 3 etc. —
    // these anchors pin Spark to the same DP.
    val rows = Seq(("kitten", "sitting"), ("abc", "abc"), ("", "abc"),
      ("flaw", "lawn")).toDF("a", "b")
      .select(levenshtein(col("a"), col("b"))).as[Int].collect().toSeq
    assert(rows === Seq(3, 0, 3, 2))
  }

  test("editVerifiedPairs: verbatim and lightly-edited clones pass, vocabulary-shuffles fail the gate") {
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra tango"
    val edited = base.replace("echo", "ечно") // one word swapped
    // Same word SET (LSH collides: identical distinct shingles would
    // need same ORDER for 3-shingles — so build the shuffle by
    // repeating the same words in a different sequence long enough to
    // share most shingles is unreliable; instead pin the gate directly
    // on a verbatim pair plus an edited pair.)
    val docs = Seq(
      (1L, base), (2L, base),            // verbatim clone: dist 0
      (3L, edited),                      // light edit of base
      (4L, "totally different text about completely unrelated topics " +
        "with many extra words making no shared shingles at all whatsoever " +
        "zulu yankee xray whiskey victor uniform")
    ).toDF("doc_id", "text")
    val pairs = graft.llm.DedupOps.editVerifiedPairs(docs,
        maxDistPermille = 200L)
      .select("id_a", "id_b", "edit_dist", "dist_permille")
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(pairs.map(p => (p._1, p._2)).toSeq === Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    val exact = pairs.find(p => (p._1, p._2) == (1L, 2L)).get
    assert(exact._3 === 0L && exact._4 === 0L)
    val light = pairs.find(p => (p._1, p._2) == (1L, 3L)).get
    assert(light._3 > 0L && light._4 <= 200L)
  }

  test("editVerifiedPairs: a passing-Jaccard vocabulary reorder is rejected by the edit gate") {
    // Two docs over the SAME trigram multiset read in reverse block
    // order: set-based families can pair them, the character gate
    // must not (the whole point of edit verification).
    val blockA = "one two three four five six seven eight nine ten"
    val blockB = "red blue green yellow purple orange pink brown black white"
    val docs = Seq(
      (1L, s"$blockA $blockB"),
      (2L, s"$blockB $blockA")
    ).toDF("doc_id", "text")
    // The differential that justifies the operator: the SET-based
    // verify (exact Jaccard over shingles — only the 2 seam shingles
    // differ) happily merges the reorder...
    val setPairs = graft.llm.DedupOps.ngramJaccardPairs(docs,
      threshold = 0.5).count()
    assert(setPairs === 1L, "set-Jaccard should pair the block reorder")
    // ...while the character gate must not: with prefixLen covering
    // both blocks, the reorder costs ~half the characters, far over
    // 200‰. (The pair may or may not survive LSH candidacy; if it
    // does, the gate kills it.)
    val out = graft.llm.DedupOps.editVerifiedPairs(docs,
      prefixLen = 256, maxDistPermille = 200L).count()
    assert(out === 0L)
  }

  test("noveltyScores: clone shingles score 0‰, unique text 1000‰, empty text 0-safe") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"), // clone: df=2 everywhere
      (3L, "entirely unique sentence with words appearing nowhere else"),
      (4L, "")                                             // no shingles
    ).toDF("doc_id", "text")
    val out = graft.llm.DedupOps.noveltyScores(docs)
      .select("doc_id", "n_shingles", "n_unique", "novelty_permille")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out(0)._4 === 0L && out(0)._2 === 7L && out(0)._3 === 0L)
    assert(out(1)._4 === 0L)
    assert(out(2)._4 === 1000L && out(2)._2 === out(2)._3)
    assert(out(3) === ((4L, 0L, 0L, 0L)))
  }

  test("winnowDecontaminate: an EMBEDDED benchmark passage flags; novel text keeps") {
    // The load-bearing winnowing guarantee: a fingerprint lands inside
    // every (n+w−1)-word run, so a benchmark passage long enough
    // (>= 2·(n+w−1) words for minShared=2) collides wherever it is
    // embedded — even mid-document with novel text around it.
    val passage = "alpha bravo charlie delta echo foxtrot golf hotel " +
      "india juliet kilo lima mike november oscar papa"
    val bench = Seq((100L, passage)).toDF("doc_id", "text")
    val docs = Seq(
      (1L, s"wholly new opening words here $passage and a novel tail follows"),
      (2L, "entirely separate content sharing nothing with the reference " +
        "set at all in any window of any width whatsoever")
    ).toDF("doc_id", "text")
    val out = graft.llm.DedupOps.winnowDecontaminate(docs, bench,
        n = 3, w = 4, minShared = 2L)
      .select("doc_id", "n_shared", "kept")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out(0)._2 >= 2L && !out(0)._3, s"embedded passage must flag: ${out(0)}")
    assert(out(1)._2 === 0L && out(1)._3)
  }

  test("sourceOverlap: mask-fold Jaccard matches hand-computed set overlap") {
    // srcA: {s1..s7} (7 shingles), srcB: same doc text (7, identical
    // set), srcC: disjoint text. Expected: (A,B) jaccard 1000‰,
    // (A,C)=(B,C)=0‰, and every pair row present even at zero overlap.
    val t1 = "the quick brown fox jumps over the lazy dog"
    val t2 = "entirely different words appearing in no other source text"
    val docs = Seq(
      (1L, t1, "srcA"), (2L, t1, "srcB"), (3L, t2, "srcC")
    ).toDF("doc_id", "text", "source")
    val out = graft.llm.DedupOps.sourceOverlap(docs)
      .select("src_a", "src_b", "n_a", "n_b", "n_inter", "n_union",
        "jaccard_permille")
      .as[(String, String, Long, Long, Long, Long, Long)]
      .collect().sortBy(r => (r._1, r._2))
    assert(out.length === 3)
    assert(out(0) === (("srcA", "srcB", 7L, 7L, 7L, 7L, 1000L)))
    assert(out(1)._5 === 0L && out(1)._7 === 0L) // (srcA, srcC)
    assert(out(2)._5 === 0L && out(2)._7 === 0L) // (srcB, srcC)
  }

  test("pairFrontQuality: clone pairs hit both fronts, disjoint docs pair nowhere") {
    // two verbatim clone pairs (candidates AND truth), two singletons
    // with disjoint vocabulary (no shared shingle -> neither front),
    // one null-text doc (null band keys match nothing, no shingles).
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six seven"),
      (4L, "one two three four five six seven"),
      (5L, "red orange yellow green blue violet"),
      (6L, "cat dog bird fish mouse horse cow"),
      (7L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = graft.llm.DedupOps.pairFrontQuality(docs)
      .select("n_cand", "n_truth", "n_hit", "precision_permille",
        "recall_permille")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.toSeq === Seq((2L, 2L, 2L, 1000L, 1000L)))
  }

  test("pairFrontQuality: pairless corpus reads all-zero, permilles guarded") {
    val docs = Seq(
      (1L, "red orange yellow green blue violet"),
      (2L, "cat dog bird fish mouse horse cow")
    ).toDF("doc_id", "text")
    val out = graft.llm.DedupOps.pairFrontQuality(docs)
      .select("n_cand", "n_truth", "n_hit", "precision_permille",
        "recall_permille")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.toSeq === Seq((0L, 0L, 0L, 0L, 0L)))
  }

  test("winnowMatchSpans: differential vs fingerprints x qualified pairs") {
    val quote = "the five boxing wizards jump quickly over the lazy brown dog tonight"
    val docs = Seq(
      (1L, s"alpha beta gamma $quote delta epsilon zeta eta theta"),
      (2L, s"one two $quote three four five six seven eight nine ten"),
      (3L, "completely unrelated filler words about cooking pasta sauce recipes")
    ).toDF("doc_id", "text")
    val spans = graft.llm.DedupOps.winnowMatchSpans(docs, n = 3, w = 4,
        minShared = 2L)
      .select("id_a", "id_b", "fp", "pos_a", "pos_b")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // expectation from the public pieces: qualified pairs x every
    // co-located print value's position cross-product
    val fps = graft.llm.DedupOps.winnowFingerprints(docs, n = 3, w = 4)
      .select("doc_id", "pos", "fp").as[(Long, Long, Long)].collect()
    val byDoc = fps.groupBy(_._1)
    val qualified = graft.llm.DedupOps.winnowPairs(docs, n = 3, w = 4,
        minShared = 2L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val expected = (for {
      (a, b) <- qualified.toSeq
      (_, pa, f) <- byDoc.getOrElse(a, Array.empty[(Long, Long, Long)]).toSeq
      (_, pb, fb) <- byDoc.getOrElse(b, Array.empty[(Long, Long, Long)]).toSeq
      if f == fb
    } yield (a, b, f, pa, pb)).toSet
    assert(qualified === Set((1L, 2L)))       // the planted quote pairs
    assert(spans.nonEmpty && spans === expected)
    assert(spans.forall(r => r._1 === 1L && r._2 === 2L)) // doc 3 nowhere
  }

  test("winnowContaminationSources: names the leaking benchmark doc, 1-print grazes filtered") {
    val passage = "the quick brown fox jumps over the lazy sleeping dog again"
    val bench = Seq((100L, passage)).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, s"intro words before $passage and some trailing words here"),
      (2L, "totally different content about databases and query planners today")
    ).toDF("doc_id", "text")
    val out = graft.llm.DedupOps.winnowContaminationSources(
        corpus, bench, n = 3, w = 4, minShared = 2L)
      .select("doc_id", "bench_id", "n_shared")
      .as[(Long, Long, Long)].collect()
    assert(out.length === 1)
    assert(out(0)._1 === 1L && out(0)._2 === 100L && out(0)._3 >= 2L)
  }

  test("pairSetScorecard: exact counts and permilles against a reference set") {
    import spark.implicits._
    val ref = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("id_a", "id_b")
    val fA = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")          // subset
    val fB = Seq((1L, 2L), (7L, 8L), (9L, 10L), (11L, 12L))
      .toDF("id_a", "id_b")                                         // 1 of 4 right
    val out = graft.llm.DedupOps.pairSetScorecard(
        Seq("a" -> fA, "b" -> fB), ref)
      .select("front_idx", "front", "n_pairs", "n_ref", "n_common",
        "precision_permille", "recall_permille")
      .as[(Long, String, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(out(0) === ((0L, "a", 2L, 3L, 2L, 1000L, 666L)))
    assert(out(1) === ((1L, "b", 4L, 3L, 1L, 250L, 333L)))
  }

  test("winnowScrub: w=1 removes every shared n-gram; clean docs byte-identical; threshold respected") {
    val passage = "the quick brown fox jumps over the lazy sleeping dog tonight"
    val corpus = Seq(
      (1L, s"novel intro here $passage and a novel ending here"),
      (2L, "completely unrelated document about spark query planning")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, passage)).toDF("doc_id", "text")
    // w = 1 selects EVERY shingle position, so the scrub removes every
    // shared 3-gram OF THE ORIGINAL text; on this fixture (distinct
    // flanks) the splice forms no new benchmark gram, so the scrubbed
    // text shares no trigram at all
    val out1 = graft.llm.DedupOps.winnowScrub(corpus, bench, n = 3,
        w = 1, minShared = 2L)
      .select("doc_id", "n_shared", "n_removed", "text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    val benchGrams = passage.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val scrubbedGrams = out1(0)._4.split(" ").sliding(3).map(_.mkString(" ")).toSet
    assert(out1(0)._3 > 0L, "contaminated doc must lose words")
    assert(scrubbedGrams.intersect(benchGrams).isEmpty,
      "w=1 scrub must leave no shared trigram")
    assert(out1(1) === ((2L, 0L, 0L, corpus.filter(col("doc_id") === 2L)
      .select("text").as[String].head())), "clean doc must pass byte-identical")
    // default w = 4 scrubs anchors only: fewer words removed than w = 1
    val out4 = graft.llm.DedupOps.winnowScrub(corpus, bench, n = 3,
        w = 4, minShared = 2L)
      .select("doc_id", "n_removed").as[(Long, Long)].collect().sortBy(_._1)
    assert(out4(0)._2 > 0L && out4(0)._2 <= out1(0)._3)
    // sub-threshold: a doc sharing prints below minShared keeps its text
    val grazer = Seq((3L, "the quick brown unrelated words follow here now")).toDF("doc_id", "text")
    val g = graft.llm.DedupOps.winnowScrub(grazer, bench, n = 3, w = 1,
        minShared = 5L)
      .select("n_removed", "text").as[(Long, String)].head()
    assert(g._1 === 0L && g._2 === "the quick brown unrelated words follow here now")
  }

  test("dedupThresholdSweep: counts monotone non-increasing, clone pair survives every rung") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),          // jaccard 1.0
      (3L, "alpha beta gamma delta other words entirely"),  // partial
      (4L, "nothing in common with the others at all")
    ).toDF("doc_id", "text")
    val out = graft.llm.DedupOps.dedupThresholdSweep(docs)
      .select("threshold_permille", "n_pairs")
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq === Seq(300L, 400L, 500L, 600L, 700L, 800L, 900L))
    assert(out.sliding(2).forall(w => w(0)._2 >= w(1)._2), "sweep must be non-increasing")
    assert(out.last._2 === 1L, "the verbatim clone pair survives the 900 rung")
    // a pairless corpus still returns the FULL ladder, all zero
    val lone = Seq((1L, "just one single document here")).toDF("doc_id", "text")
    val zero = graft.llm.DedupOps.dedupThresholdSweep(lone)
      .select("threshold_permille", "n_pairs")
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(zero.map(_._1).toSeq === Seq(300L, 400L, 500L, 600L, 700L, 800L, 900L))
    assert(zero.forall(_._2 === 0L))
  }

  test("winnowScrub: the splice can form a NEW benchmark gram; a second pass removes it (documented caveat + remedy)") {
    val bench = Seq((100L, "X Y Z w Q R S a b c")).toDF("doc_id", "text")
    val corpus = Seq((1L, "a b X Y Z c Q R S d")).toDF("doc_id", "text")
    val once = graft.llm.DedupOps.winnowScrub(corpus, bench, n = 3,
      w = 1, minShared = 1L)
    val t1 = once.select("text").as[String].head()
    // removing runs [2..4] and [6..8] butts "a b" against "c": the
    // spliced text contains "a b c" — a benchmark trigram the original
    // text never had
    assert(t1 === "a b c d")
    val twice = graft.llm.DedupOps.winnowScrub(
      once.select(col("doc_id"), col("text")), bench, n = 3, w = 1,
      minShared = 1L)
    assert(twice.select("text").as[String].head() === "d",
      "the second pass must remove the splice-formed gram")
  }

  test("winnowScrubVerified: closes the splice loophole, bounded rounds raise, no-splice ≡ one-pass") {
    val bench = Seq((100L, "X Y Z w Q R S a b c")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "a b X Y Z c Q R S d"),                              // the splice doc
      (2L, "completely unrelated words about query planning here") // clean
    ).toDF("doc_id", "text")
    val ver = graft.llm.DedupOps.winnowScrubVerified(corpus, bench,
        n = 3, w = 1, minShared = 1L)
      .select("doc_id", "n_shared", "n_removed", "text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    // round 1 cuts 6 words (two runs), round 2 the 3-word splice gram;
    // n_shared reports the FIRST-pass evidence
    assert(ver(0)._3 === 9L && ver(0)._4 === "d")
    assert(ver(1) === ((2L, 0L,
      0L, "completely unrelated words about query planning here")))
    // a round budget too small to certify raises instead of returning
    // a corpus it cannot certify
    val e = intercept[IllegalStateException] {
      graft.llm.DedupOps.winnowScrubVerified(corpus, bench,
        n = 3, w = 1, minShared = 1L, maxRounds = 1).collect()
    }
    assert(e.getMessage.contains("fixpoint"))
    // splice-free fixture: verified ≡ one-pass, row for row
    val passage = "the quick brown fox jumps over the lazy sleeping dog tonight"
    val plain = Seq(
      (1L, s"novel intro here $passage and a novel ending here"),
      (2L, "some other document with no quotes at all")).toDF("doc_id", "text")
    val pb = Seq((100L, passage)).toDF("doc_id", "text")
    val onePass = graft.llm.DedupOps.winnowScrub(plain, pb, n = 3, w = 1,
      minShared = 2L).orderBy("doc_id").collect()
    val verified = graft.llm.DedupOps.winnowScrubVerified(plain, pb, n = 3,
      w = 1, minShared = 2L).orderBy("doc_id").collect()
    assert(verified === onePass)
  }

  test("winnowScrubVerified under UnicodeAligned: case/punct-variant leak cut from RAW words, flanks intact") {
    import graft.llm.DedupOps
    import graft.llm.DedupOps.Tokenizer
    // benchmark publishes the clean lowercase run; the corpus carries a
    // case/punctuation variant of it ("Leak1," vs "leak1") embedded in
    // clean text — invisible to the raw-surface scrub, caught on the
    // position-preserving aligned surface, and the CUT must hit the raw
    // punctuated words (not a normalized rewrite of the document)
    val leakRaw = (1 to 16).map(i => s"Leak$i,").mkString(" ")
    val leakBench = (1 to 16).map(i => s"leak$i").mkString(" ")
    val before = "my clean words before"
    val after = "and clean words after"
    val corpus = Seq((1L, s"$before $leakRaw $after"),
      (2L, "totally unrelated clean document text here"))
      .toDF("doc_id", "text")
    val bench = Seq((100L, leakBench)).toDF("doc_id", "text")

    // raw-surface scrub: no shared prints, nothing removed
    val ascii = DedupOps.winnowScrubVerified(corpus, bench, n = 3, w = 4,
      minShared = 2L).orderBy("doc_id").collect()
    assert(ascii.forall(_.getAs[Long]("n_removed") == 0L))
    assert(ascii(0).getAs[String]("text") == s"$before $leakRaw $after")

    // aligned scrub: the variant is cut from the RAW word stream
    val out = DedupOps.winnowScrubVerified(corpus, bench, n = 3, w = 4,
      minShared = 2L, tok = Tokenizer.UnicodeAligned)
      .orderBy("doc_id").collect()
    val d1 = out(0)
    assert(d1.getAs[Long]("n_removed") >= 1L)
    val rawWords = s"$before $leakRaw $after".split(" ").toSet
    val outWords = d1.getAs[String]("text").split(" ").filter(_.nonEmpty)
    // cuts, not rewrites: every surviving word is a raw word verbatim
    assert(outWords.forall(rawWords.contains))
    // cut spans lie inside the leak: both flanks survive whole
    assert(d1.getAs[String]("text").startsWith(before))
    assert(d1.getAs[String]("text").endsWith(after))
    // untouched doc passes byte-identical
    assert(out(1).getAs[Long]("n_removed") == 0L)

    // verified-clean on the SAME surface: no output doc still trips the gate
    val outDf = Seq((1L, d1.getAs[String]("text"))).toDF("doc_id", "text")
    val shared = DedupOps.winnowFingerprints(outDf, 3, 4, Tokenizer.UnicodeAligned)
      .join(DedupOps.winnowFingerprints(bench, 3, 4, Tokenizer.UnicodeAligned)
        .select(col("fp")).distinct(), "fp")
      .select("doc_id", "fp").distinct().count()
    assert(shared < 2L)

    // the collapsing Unicode tokenizer is position-UNSAFE for a rewrite
    val e = intercept[IllegalArgumentException] {
      DedupOps.winnowScrubVerified(corpus, bench, n = 3, w = 4,
        minShared = 2L, tok = Tokenizer.Unicode)
    }
    assert(e.getMessage.contains("UnicodeAligned"))
  }
}
