package graft

import graft.functions.UnigramCodec
import graft.llm.UnigramLm
import graft.llm.UnigramLm.Piece
import graft.model.Tables
import org.apache.spark.sql.functions._

/**
 * Unigram-LM tokenizer semantics the hash-checked oracles (q220–q223)
 * can't pin from the outside: the Viterbi tie-break order (cost, piece
 * count, packed segmentation in UTF-8 byte order), the unknown-single-
 * code-point fallback, chunk boundaries as hard segmentation walls,
 * code-point (not UTF-16 unit) indexing, and learn/re-estimate
 * determinism. The reference implementations here are sequential Scala —
 * deliberately independent of both the codegen'd codec and the DuckDB
 * DP-chain replay.
 */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** Code points of a string, each as its own String. */
  private def cps(s: String): Vector[String] =
    s.codePoints().toArray.toVector.map(cp => new String(Character.toChars(cp)))

  /** Reference chunking: whitespace words cut every `cl` code points. */
  private def refChunks(text: String, cl: Int): Seq[Vector[String]] =
    text.split(" ").filter(_.nonEmpty).toSeq
      .flatMap(w => cps(w).grouped(cl).toSeq)

  /** Reference Viterbi over one chunk — exhaustive DP with explicit
    * (cost, np, seg) state comparison. */
  private def refViterbi(chunk: Vector[String], vocab: Map[String, Long],
      unk: Long, maxL: Int): Seq[String] = {
    final case class St(cost: Long, np: Int, seg: String)
    def better(a: St, b: St): Boolean =
      a.cost < b.cost || (a.cost == b.cost &&
        (a.np < b.np || (a.np == b.np && utf8Lt(a.seg, b.seg))))
    val n = chunk.length
    val best = new Array[St](n + 1)
    best(0) = St(0L, 0, "")
    for (j <- 1 to n) {
      var b: St = null
      for (l <- 1 to math.min(j, maxL)) {
        val piece = chunk.slice(j - l, j).mkString
        val pc = vocab.get(piece) match {
          case Some(c) => Some(c)
          case None if l == 1 => Some(unk)
          case None => None
        }
        pc.foreach { c =>
          val prev = best(j - l)
          val cand = St(prev.cost + c, prev.np + 1,
            if (prev.seg.isEmpty) piece else prev.seg + "~" + piece)
          if (b == null || better(cand, b)) b = cand
        }
      }
      best(j) = b
    }
    best(n).seg.split('~').toSeq
  }

  private def refTokens(text: String, vocab: Map[String, Long], unk: Long,
      cl: Int, maxL: Int): Seq[String] =
    refChunks(text, cl).flatMap(c => refViterbi(c, vocab, unk, maxL))

  private def codecOf(vocab: Map[String, Long], unk: Long, cl: Int,
      maxL: Int): UnigramCodec = {
    val ps = vocab.toArray.sortBy(_._1)
    new UnigramCodec(ps.map(_._1), ps.map(_._2), cl, maxL, unk)
  }

  private def sparkTokens(texts: Seq[String], codec: UnigramCodec): Seq[Seq[String]] =
    texts.toDF("text")
      .select(UnigramLm.tokens(col("text"), codec).as("t"))
      .collect().map(_.getSeq[String](0).toList).toSeq

  test("codec ≡ reference Viterbi on a mixed fixture (codegen path)") {
    val vocab = Map[String, Long]("a" -> 3, "b" -> 3, "c" -> 4, "n" -> 2,
      "ab" -> 4, "ba" -> 5, "an" -> 3, "na" -> 3, "ana" -> 4, "ban" -> 5)
    val unk = 6L
    val texts = Seq("banana band", "abab ab a", "cabba", "nan ban anna",
      "a b c", "xyz abx", "")
    val got = sparkTokens(texts, codecOf(vocab, unk, 6, 3))
    val want = texts.map(t => refTokens(t, vocab, unk, 6, 3))
    assert(got == want)
  }

  test("tie on cost prefers fewer pieces") {
    // "ab" as one piece (cost 2) ties [a, b] (1 + 1): np breaks the tie
    val vocab = Map[String, Long]("a" -> 1, "b" -> 1, "ab" -> 2)
    val got = sparkTokens(Seq("ab"), codecOf(vocab, 9, 6, 3))
    assert(got == Seq(Seq("ab")))
  }

  test("tie on cost and count breaks on packed segmentation bytes") {
    // [ab, c] and [a, bc] both cost 2 with 2 pieces; "ab~c" < "a~bc" in
    // UTF-8 bytes ('b' 0x62 < '~' 0x7e) so [ab, c] must win — on both
    // engines (the oracle's min() over VARCHAR keys picks the same).
    val vocab = Map[String, Long]("a" -> 1, "b" -> 1, "c" -> 1,
      "ab" -> 1, "bc" -> 1)
    val got = sparkTokens(Seq("abc"), codecOf(vocab, 9, 6, 3))
    assert(got == Seq(Seq("ab", "c")))
  }

  test("unknown single code point falls back to unkCost; longer OOV never a piece") {
    val vocab = Map[String, Long]("a" -> 1)
    // "xa": x is OOV → single-char unk piece; "xx" never considered
    val got = sparkTokens(Seq("xxa"), codecOf(vocab, 5, 6, 3))
    assert(got == Seq(Seq("x", "x", "a")))
  }

  test("chunk boundaries are segmentation walls") {
    // chunkLen 3: "abcd" → chunks [abc][d]; "cd" is in vocab but may not
    // span the boundary
    val vocab = Map[String, Long]("a" -> 1, "b" -> 1, "c" -> 1, "d" -> 1,
      "cd" -> 1, "abc" -> 1)
    val got = sparkTokens(Seq("abcd"), codecOf(vocab, 9, 3, 3))
    assert(got == Seq(Seq("abc", "d")))
  }

  test("count ≡ tokens length, nulls and empties are zero") {
    val vocab = Map[String, Long]("a" -> 1, "b" -> 2, "ab" -> 2)
    val codec = codecOf(vocab, 7, 4, 3)
    val df = Seq(Some("abab baa x"), Some(""), None, Some("   "))
      .toDF("text")
      .select(UnigramLm.tokenCount(col("text"), codec).as("n"),
        size(UnigramLm.tokens(col("text"), codec)).cast("long").as("m"))
    assert(df.collect().forall(r => r.getLong(0) == r.getLong(1)))
    assert(df.collect().map(_.getLong(0)).drop(1).forall(_ == 0L))
  }

  test("code-point indexing: supplementary-plane chars are single positions") {
    // 𝄞 (U+1D11E) is one code point / two UTF-16 units; with chunkLen 2
    // the word "𝄞a𝄞" must chunk [𝄞a][𝄞], never split a surrogate pair
    val vocab = Map[String, Long]("𝄞" -> 1, "a" -> 1,
      "𝄞a" -> 1)
    val got = sparkTokens(Seq("𝄞a𝄞"),
      codecOf(vocab, 9, 2, 2))
    val want = refTokens("𝄞a𝄞", vocab, 9, 2, 2)
    assert(got == Seq(want))
    assert(got == Seq(Seq("𝄞a", "𝄞")))
  }

  /** Independent brute-force learn over the fixture: substring counts,
    * singleton floor, top-V multi-char selection, bitlen costs. */
  private def refLearn(texts: Seq[String], cl: Int, maxL: Int,
      minCount: Long, vocabSize: Int): Seq[Piece] = {
    val freq = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach(t => refChunks(t, cl).foreach { ch =>
      for (s <- ch.indices; l <- 1 to math.min(maxL, ch.length - s)) {
        val p = ch.slice(s, s + l).mkString
        freq(p) = freq.getOrElse(p, 0L) + 1L
      }
    })
    def cpsLen(s: String) = s.codePointCount(0, s.length)
    val sing = freq.filter { case (p, _) => cpsLen(p) == 1 }.toSeq
    val multi = freq.filter { case (p, f) => cpsLen(p) >= 2 && f >= minCount }
      .toSeq.sortWith((a, b) =>
        a._2 > b._2 || (a._2 == b._2 && utf8Lt(a._1, b._1)))
      .take(vocabSize)
    val sel = sing ++ multi
    val tot = sel.map(_._2).sum
    def bl(n: Long) = if (n <= 0) 1L else (64 - java.lang.Long.numberOfLeadingZeros(n)).toLong
    sel.map { case (p, f) => Piece(p, f, bl(tot) - bl(f)) }
      .sortWith((a, b) => utf8Lt(a.piece, b.piece))
  }

  test("learnVocab ≡ independent brute force on a fixture corpus") {
    val texts = Seq("banana band banana", "ababab cabbage", "a cab can nab",
      "bandana ban")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = UnigramLm.learnVocab(docs, chunkLen = 6, maxPieceLen = 3,
      minCount = 3L, vocabSize = 5)
    val want = refLearn(texts, 6, 3, 3L, 5)
    assert(got == want)
  }

  /** ALL segmentations of one chunk (exhaustive enumeration — the
    * independent reference for the n-best DP), ordered by
    * (cost, pieces, utf8 seg). */
  private def refNbestAll(chunk: Vector[String], vocab: Map[String, Long],
      unk: Long, maxL: Int): Seq[(Long, Int, String)] = {
    def go(j: Int): Seq[(Long, Int, String)] =
      if (j == 0) Seq((0L, 0, ""))
      else (1 to math.min(j, maxL)).flatMap { l =>
        val piece = chunk.slice(j - l, j).mkString
        val pc = vocab.get(piece).orElse(if (l == 1) Some(unk) else None)
        pc.toSeq.flatMap(c => go(j - l).map { case (c0, np0, s0) =>
          (c0 + c, np0 + 1, if (s0.isEmpty) piece else s0 + "~" + piece)
        })
      }
    go(chunk.length).sortWith((a, b) =>
      a._1 < b._1 || (a._1 == b._1 && (a._2 < b._2 ||
        (a._2 == b._2 && utf8Lt(a._3, b._3)))))
  }

  test("nbestSampledReport ≡ exhaustive sequential reference across seeds; " +
      "n = 1 is the Viterbi encode") {
    val rows = Seq(
      ("banana band banana", "a"), ("ababab cabbage", "a"),
      ("a cab can nab", "b"), ("bandana ban", "b"), ("nan ban anna", "c"))
    val docs = rows.zipWithIndex.map { case ((t, src), i) => (i.toLong, t, src) }
      .toDF("doc_id", "text", "source")
    val vocab = refLearn(rows.map(_._1), 6, 3, 2L, 8)
    val costMap = vocab.map(p => p.piece -> p.cost).toMap
    val tot = vocab.map(_.freq).sum
    def bl2(n: Long) =
      if (n <= 0) 1L else (64 - java.lang.Long.numberOfLeadingZeros(n)).toLong
    val unk = bl2(tot) - 1
    val P = 1000000007L
    def hash(s: String): Long = s.foldLeft(0L)((h, c) => (h * 31 + c.toInt) % P)
    val ns = Seq(1, 2, 3)
    for (salt <- Seq("s1", "s2", "s3")) {
      val got = UnigramLm.nbestSampledReport(docs, vocab, 6, 3, salt, ns)
        .orderBy("n", "source")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
      val chunksBySrc: Seq[(String, String)] = rows.flatMap { case (t, src) =>
        refChunks(t, 6).map(c => (src, c.mkString)) }
      val want = for {
        n <- ns
        src <- chunksBySrc.map(_._1).distinct.sorted
      } yield {
        val counts = chunksBySrc.filter(_._1 == src).groupBy(_._2)
          .map { case (w, g) => w -> g.size.toLong }
        var nc = 0L; var nt = 0L; var tb = 0L; var sh = 0L
        counts.foreach { case (w, cnt) =>
          val all = refNbestAll(cps(w), costMap, unk, 3)
          val m = math.min(n, all.size)
          val (c, np, seg) = all((hash(salt + "~" + w) % m).toInt)
          nc += cnt; nt += cnt * np; tb += cnt * c
          sh += ((cnt % P) * hash(seg)) % P
        }
        (n.toLong, src, nc, nt, nt * 1000 / math.max(nc, 1), tb, sh)
      }
      assert(got == want, s"salt=$salt")
      // n = 1's pick is hash % 1 = the lattice top — the Viterbi encode
      val codec = UnigramLm.codecOf(vocab, 6, 3)
      val vit = docs.groupBy("source")
        .agg(org.apache.spark.sql.functions.sum(
          UnigramLm.tokenCount(col("text"), codec)).as("t"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      got.filter(_._1 == 1L).foreach { case (_, src, _, nTok, _, _, _) =>
        assert(nTok === vit(src), s"n=1 diverged from Viterbi for $src")
      }
    }
  }

  test("nbestChunk prunes losslessly: DP top-n == exhaustive top-n") {
    val vocab = Map[String, Long]("a" -> 1, "b" -> 2, "ab" -> 2, "ba" -> 3,
      "ban" -> 4, "an" -> 2, "na" -> 2, "n" -> 3, "ana" -> 5)
    val unk = 7L
    for (w <- Seq("banana", "abcab", "xxyy", "a", "nanaba");
         n <- Seq(1, 2, 3, 5, 8)) {
      val got = UnigramLm.nbestChunk(w, vocab, unk, 3, n)
      val want = refNbestAll(cps(w), vocab, unk, 3).take(n).toVector
      assert(got === want, s"word=$w n=$n")
    }
  }

  test("reestimate counts usage exactly and re-costs the same piece set") {
    val texts = Seq("banana band banana", "ababab cabbage", "a cab can nab")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val v1 = UnigramLm.learnVocab(docs, 6, 3, 3L, 5)
    val v2 = UnigramLm.reestimate(docs, v1, 6, 3)
    assert(v2.map(_.piece) == v1.map(_.piece))
    // independent usage count: encode every text with the reference
    // Viterbi under v1's costs and tally pieces
    val vocab = v1.map(p => p.piece -> p.cost).toMap
    val unk = UnigramLm.codecOf(v1, 6, 3).unkCost
    val want = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach(t => refTokens(t, vocab, unk, 6, 3)
      .foreach(p => want(p) = want.getOrElse(p, 0L) + 1L))
    v2.foreach(p => assert(p.freq == want.getOrElse(p.piece, 0L),
      s"usage mismatch for '${p.piece}'"))
    // totals agree with the corpus token count
    val codec1 = UnigramLm.codecOf(v1, 6, 3)
    val totalToks = docs
      .agg(sum(UnigramLm.tokenCount(col("text"), codec1))).head.getLong(0)
    assert(v2.map(_.freq).sum == totalToks)
  }

  test("UnigramIndex: build→load roundtrip ≡ learnVocab, geometry stored") {
    import graft.llm.UnigramIndex
    val texts = Seq("banana band banana", "ababab cabbage", "a cab can nab")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("ug_idx_spec").toString
    UnigramIndex.build(docs, dir, chunkLen = 5, maxPieceLen = 2,
      minCount = 2L, vocabSize = 6)
    val (ps, cl, mpl) = UnigramIndex.loadWithGeometry(spark, dir)
    assert((cl, mpl) == (5, 2))
    assert(ps == UnigramLm.learnVocab(docs, 5, 2, 2L, 6))
    // the stored table reads back piece-ordered and value-identical
    val tbl = UnigramIndex.loadVocab(spark, dir).orderBy("piece")
      .as[(String, Long, Long)].collect().toSeq
    assert(tbl == ps.map(p => (p.piece, p.freq, p.cost)))
  }

  test("UnigramIndex.buildEm: EM vocabulary persists with its pricing total; tampering refuses") {
    import graft.llm.{SwapManifest, UnigramIndex}
    val texts = Seq("banana band banana", "ababab cabbage", "a cab can nab",
      "and band bandana nab an abba", "cancan banana cab and")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("ug_em_idx").toString
    UnigramIndex.buildEm(docs, dir, 6, 3, 2L, seedSize = 8, targetSize = 3,
      keepPermille = 600)
    val em = UnigramLm.learnEm(docs, 6, 3, 2L, 8, 3, 600).last
    val (ps, cl, mpl, tot) = UnigramIndex.loadModel(spark, dir)
    assert(ps == em.vocab && tot == em.usageTotal && (cl, mpl) == ((6, 3)))
    assert(UnigramIndex.loadWithGeometry(spark, dir)._1 == em.vocab)
    assert(UnigramIndex.healthCheck(spark, dir).head()
      .getAs[Boolean]("healthy"))
    // a tampered pricing total breaks the cost-formula check as loudly
    // as a tampered cost would (the total IS part of the model)
    val p = spark.read.parquet(s"$dir/params").head()
    Seq((p.getAs[Int]("n_pieces"), 6, 3, p.getAs[Long]("unk_cost"),
        p.getAs[Long]("sig"), p.getAs[Long]("fert_permille"),
        p.getAs[Long]("priced_tot") * 2 + 1))
      .toDF("n_pieces", "chunk_len", "max_piece_len", "unk_cost", "sig",
        "fert_permille", "priced_tot")
      .write.mode("overwrite").parquet(s"$dir/params")
    val fs = SwapManifest.fsOf(spark, dir)
    val v = SwapManifest.newVersion()
    SwapManifest.stampTables(fs, dir, Seq("pieces", "params"), v)
    SwapManifest.writeManifest(fs, dir, Map("pieces" -> v, "params" -> v))
    val e = intercept[IllegalArgumentException](
      UnigramIndex.loadModel(spark, dir))
    assert(e.getMessage.contains("pricing total"))
    assert(!UnigramIndex.healthCheck(spark, dir).head()
      .getAs[Boolean]("cost_ok"))
  }

  test("UnigramIndex.rebuildEm: staged swap to a re-learned EM model; drift report works on EM artifacts") {
    import graft.llm.UnigramIndex
    val a = Seq((1L, "banana band banana"), (2L, "ababab cabbage"),
      (3L, "a cab can nab"), (4L, "and band bandana nab an abba"),
      (5L, "cancan banana cab and")).toDF("doc_id", "text")
    val b = Seq((1L, "queue quiz quartz quest"), (2L, "squid quorum quip"),
      (3L, "quart quinoa squat"), (4L, "aqua quake quasi quill"),
      (5L, "equal squeak quench")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("ug_em_swap").toString
    UnigramIndex.buildEm(a, dir, 6, 3, 2L, seedSize = 8, targetSize = 3,
      keepPermille = 600)
    UnigramIndex.rebuildEm(b, dir, 6, 3, 2L, seedSize = 8, targetSize = 3,
      keepPermille = 600)
    val emB = UnigramLm.learnEm(b, 6, 3, 2L, 8, 3, 600).last
    val (ps, _, _, tot) = UnigramIndex.loadModel(spark, dir)
    assert(ps == emB.vocab && tot == emB.usageTotal)
    assert(UnigramIndex.healthCheck(spark, dir).head()
      .getAs[Boolean]("healthy"))
    // driftCheck reads the EM artifact through loadModel/codecPriced:
    // zero drift on its own training corpus, exact report arithmetic
    val r = UnigramIndex.driftCheck(b, dir).head()
    assert(r.getAs[Long]("drift_permille") === 0L)
  }

  test("UnigramIndex: rebuild swaps live; a torn stamp refuses to load; healthCheck reports") {
    import graft.llm.UnigramIndex
    val a = Seq((1L, "banana band banana"), (2L, "ababab cab"))
      .toDF("doc_id", "text")
    val b = Seq((1L, "queue quiz quartz"), (2L, "squid quorum"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("ug_idx_swap").toString
    UnigramIndex.build(a, dir)
    UnigramIndex.rebuild(b, dir)
    assert(UnigramIndex.load(spark, dir) == UnigramLm.learnVocab(b))
    assert(UnigramIndex.healthCheck(spark, dir).head().getAs[Boolean]("healthy"))
    // torn swap: one table's version stamp disagrees with the manifest
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val stamp = new org.apache.hadoop.fs.Path(s"$dir/pieces/_graft_version")
    val orig = {
      val in = fs.open(stamp)
      try {
        val buf = new Array[Byte](256)
        val n = in.read(buf)
        new String(buf, 0, n, "UTF-8")
      } finally in.close()
    }
    val out = fs.create(stamp, true)
    try out.write("some-other-version".getBytes("UTF-8")) finally out.close()
    val e = intercept[IllegalStateException](UnigramIndex.load(spark, dir))
    assert(e.getMessage.contains("version check") &&
      e.getMessage.contains("pieces"))
    val h = UnigramIndex.healthCheck(spark, dir).head()
    assert(!h.getAs[Boolean]("healthy") &&
      h.getAs[String]("stale_tables") === "pieces")
    val out2 = fs.create(stamp, true)
    try out2.write(orig.getBytes("UTF-8")) finally out2.close()
    assert(UnigramIndex.healthCheck(spark, dir).head().getAs[Boolean]("healthy"))
  }

  test("UnigramIndex: mixed params and drifted costs report unhealthy; load throws") {
    import graft.llm.UnigramIndex
    val docs = Seq((1L, "banana band banana"), (2L, "ababab cab"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("ug_idx_health").toString
    UnigramIndex.build(docs, dir)
    val ps = UnigramIndex.load(spark, dir)
    // a hand-tampered table wipes its version stamp, which the manifest
    // check would catch FIRST; re-stamp after each overwrite so the
    // CONTENT checks (signature, cost formula) are what's exercised
    import graft.llm.SwapManifest
    def restamp(): Unit = {
      val fs = SwapManifest.fsOf(spark, dir)
      val v = SwapManifest.newVersion()
      SwapManifest.stampTables(fs, dir, Seq("pieces", "params"), v)
      SwapManifest.writeManifest(fs, dir,
        Map("pieces" -> v, "params" -> v))
    }
    // mixed artifact: params from a different build over old pieces —
    // only the content signature catches it
    val codec = UnigramLm.codecOf(ps, 6, 3)
    Seq((ps.size, 6, 3, codec.unkCost, UnigramIndex.signature(ps) ^ 0x77L,
        0L))
      .toDF("n_pieces", "chunk_len", "max_piece_len", "unk_cost", "sig",
        "fert_permille")
      .write.mode("overwrite").parquet(s"$dir/params")
    restamp()
    val hMixed = UnigramIndex.healthCheck(spark, dir).head()
    assert(!hMixed.getAs[Boolean]("healthy") && !hMixed.getAs[Boolean]("sig_ok"))
    assert(hMixed.getAs[Boolean]("n_ok") && hMixed.getAs[Boolean]("cost_ok"))
    intercept[IllegalArgumentException](UnigramIndex.load(spark, dir))
    // rebuild restores; then a cost drifted from its own frequencies —
    // internally consistent shape, wrong prices — trips the formula check
    UnigramIndex.rebuild(docs, dir)
    val ps2 = UnigramIndex.load(spark, dir)
    val broken = ps2.map(p => (p.piece, p.freq, p.cost + 1L))
    broken.toDF("piece", "freq", "cost")
      .write.mode("overwrite").parquet(s"$dir/pieces")
    Seq((ps2.size, 6, 3, UnigramLm.codecOf(ps2, 6, 3).unkCost,
        UnigramIndex.signature(broken.map(t => Piece(t._1, t._2, t._3))),
        0L))
      .toDF("n_pieces", "chunk_len", "max_piece_len", "unk_cost", "sig",
        "fert_permille")
      .write.mode("overwrite").parquet(s"$dir/params")
    restamp()
    val hCost = UnigramIndex.healthCheck(spark, dir).head()
    assert(!hCost.getAs[Boolean]("healthy") && !hCost.getAs[Boolean]("cost_ok"))
    assert(hCost.getAs[Boolean]("sig_ok"))
    intercept[IllegalArgumentException](UnigramIndex.load(spark, dir))
  }

  test("UnigramIndex.driftCheck: zero drift on the training corpus, report is exact") {
    import graft.llm.UnigramIndex
    val docs = Seq((1L, "banana band banana"), (2L, "ababab cab nab"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("ug_idx_drift").toString
    UnigramIndex.build(docs, dir)
    val r = UnigramIndex.driftCheck(docs, dir).head()
    assert(r.getAs[Long]("drift_permille") === 0L)
    assert(r.getAs[Long]("fert_now_permille") ===
      r.getAs[Long]("fert_train_permille"))
    // a shifted snapshot (unseen chars → unk pieces) moves fertility and
    // the report's arithmetic stays consistent
    val drifted = Seq((1L, "zzzz qqqq zzzz"), (2L, "xyxy xy"))
      .toDF("doc_id", "text")
    val r2 = UnigramIndex.driftCheck(drifted, dir).head()
    assert(r2.getAs[Long]("drift_permille") ===
      r2.getAs[Long]("fert_now_permille") -
        r2.getAs[Long]("fert_train_permille"))
  }

  private def bl(n: Long): Long =
    if (n <= 0) 1L else (64 - java.lang.Long.numberOfLeadingZeros(n)).toLong

  /** Exhaustive minimum cost of segmenting `piece` into ≥2 parts — the
    * prune criterion's alternative price, by brute enumeration (every
    * composition walked recursively), independent of the DP under test. */
  private def refAltCost(piece: String, costs: Map[String, Long], unk: Long,
      maxL: Int): Long = {
    val v = cps(piece)
    def go(from: Int, nParts: Int): Long =
      if (from == v.length) { if (nParts >= 2) 0L else Long.MaxValue }
      else (1 to math.min(maxL, v.length - from)).map { l =>
        val part = v.slice(from, from + l).mkString
        val pc = costs.getOrElse(part, if (l == 1) unk else Long.MaxValue)
        val rest = go(from + l, nParts + 1)
        if (pc == Long.MaxValue || rest == Long.MaxValue) Long.MaxValue
        else pc + rest
      }.min
    // forbid the single whole-span part: nParts must end >= 2
    go(0, 0)
  }

  /** Sequential reference of the full EM+prune learn: seed via refLearn,
    * then per round — reference-Viterbi usage tally, bitlen re-cost,
    * brute-force alternative pricing, keep top-k by (loss DESC, piece
    * ASC). Independent of learnEm's distributed aggregates and of the
    * codegen'd codec. */
  private def refLearnEm(texts: Seq[String], cl: Int, maxL: Int,
      minCount: Long, seedSize: Int, targetSize: Int,
      keepPm: Int): (Seq[Piece], Long, Seq[Int]) = {
    var vocab = refLearn(texts, cl, maxL, minCount, seedSize)
    var tot = vocab.map(_.freq).sum
    def cpsLen(s: String) = s.codePointCount(0, s.length)
    // the keep ladder, derived independently (same floor formula)
    val ladder = {
      val b = Seq.newBuilder[Int]
      var cur = seedSize
      while (cur > targetSize) {
        cur = math.max(targetSize, cur * keepPm / 1000); b += cur
      }
      b.result()
    }
    ladder.foreach { keep =>
      val costs = vocab.map(p => p.piece -> p.cost).toMap
      val unk = bl(tot) - 1L
      val usage = scala.collection.mutable.Map.empty[String, Long]
      texts.foreach(t => refTokens(t, costs, unk, cl, maxL)
        .foreach(p => usage(p) = usage.getOrElse(p, 0L) + 1L))
      val newTot = usage.valuesIterator.sum
      val re = vocab.map { p =>
        val u = usage.getOrElse(p.piece, 0L)
        Piece(p.piece, u, bl(newTot) - bl(u))
      }
      val cm = re.map(p => p.piece -> p.cost).toMap
      val unk2 = bl(newTot) - 1L
      val (multis, singles) = re.partition(p => cpsLen(p.piece) >= 2)
      def loss(p: Piece): Long =
        p.freq * (refAltCost(p.piece, cm, unk2, maxL) - p.cost)
      val ranked = multis.sortWith((a, b) =>
        loss(a) > loss(b) || (loss(a) == loss(b) && utf8Lt(a.piece, b.piece)))
      vocab = (singles ++ ranked.take(keep))
        .sortWith((a, b) => utf8Lt(a.piece, b.piece))
      tot = newTot
    }
    (vocab, tot, ladder)
  }

  test("learnEm ≡ sequential reference across seeded random corpora") {
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      val alpha = "abcd"
      def word() = Seq.fill(1 + rnd.nextInt(7))(
        alpha(rnd.nextInt(alpha.length))).mkString
      val texts = Seq.fill(30)(Seq.fill(8)(word()).mkString(" "))
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = UnigramLm.learnEm(docs, chunkLen = 6, maxPieceLen = 3,
        minCount = 2L, seedSize = 8, targetSize = 3, keepPermille = 600)
      val (wantVocab, wantTot, ladder) =
        refLearnEm(texts, 6, 3, 2L, 8, 3, 600)
      assert(got.size == ladder.size)
      // every round shrinks the multi budget exactly along the ladder
      got.zip(ladder).foreach { case (r, keep) =>
        assert(r.vocab.count(p => p.piece.codePointCount(0,
          p.piece.length) >= 2) == keep, s"round ${r.round} multi count")
        assert(r.pruned.nonEmpty, s"round ${r.round} pruned nothing")
      }
      assert(got.last.vocab == wantVocab, s"corpus seed $seed")
      assert(got.last.usageTotal == wantTot)
      // singles are never pruned: coverage floor survives every round
      val singles0 = UnigramLm.learnVocab(docs, 6, 3, 2L, 8)
        .map(_.piece).filter(p => p.codePointCount(0, p.length) == 1).toSet
      assert(singles0.subsetOf(got.last.vocab.map(_.piece).toSet))
    }
  }

  test("learnEm refuses a corpus that cannot fill the seed") {
    val docs = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException](
      UnigramLm.learnEm(docs, 6, 3, 2L, seedSize = 50, targetSize = 10,
        keepPermille = 600))
    assert(e.getMessage.contains("seed"))
  }

  test("codecOf refuses costs priced against a different total; codecPriced accepts it") {
    // pieces priced against tot = 100 while sum(freq) = 30 — the
    // EM-after-prune shape (pruned/unk mass carried usage)
    val tot = 100L
    val pieces = Seq(Piece("a", 10L, bl(tot) - bl(10L)),
      Piece("b", 20L, bl(tot) - bl(20L)))
    intercept[IllegalArgumentException](UnigramLm.codecOf(pieces, 6, 3))
    val codec = UnigramLm.codecPriced(pieces, 6, 3, tot)
    assert(codec.unkCost == bl(tot) - 1L)
    // and a WRONG explicit total is refused too
    intercept[IllegalArgumentException](
      UnigramLm.codecPriced(pieces, 6, 3, 100000L))
    // learnEm's own trace always threads a codec-accepted total
    val texts = Seq("banana band banana", "ababab cabbage", "a cab can nab",
      "and band bandana nab an abba", "cancan banana cab and")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val em = UnigramLm.learnEm(docs, 6, 3, 2L, seedSize = 8, targetSize = 3,
      keepPermille = 600).last
    UnigramLm.codecPriced(em.vocab, 6, 3, em.usageTotal) // must not throw
  }

  test("reestimate refuses a separator-bearing corpus on both call paths") {
    import graft.llm.UnigramIndex
    val clean = Seq((1L, "banana band banana"), (2L, "ababab cab nab"))
      .toDF("doc_id", "text")
    val dirty = Seq((1L, "ban~na band")).toDF("doc_id", "text")
    val v1 = UnigramLm.learnVocab(clean, 6, 3, 2L, 5)
    // inline path: the re-estimation corpus, not the learn corpus, is dirty
    val e = intercept[IllegalArgumentException](
      UnigramLm.reestimate(dirty, v1, 6, 3))
    assert(e.getMessage.contains("separator"))
    // served path: same refusal when the pieces come from a stored index
    val dir = java.nio.file.Files.createTempDirectory("ug_sep_idx").toString
    UnigramIndex.build(clean, dir, 6, 3, 2L, 5)
    val (ps, cl, mpl) = UnigramIndex.loadWithGeometry(spark, dir)
    val e2 = intercept[IllegalArgumentException](
      UnigramLm.reestimate(dirty, ps, cl, mpl))
    assert(e2.getMessage.contains("separator"))
  }

  test("registry vocabulary on the sf0.001 corpus: coverage and cost sanity") {
    val docs = Tables.documents(spark, sfDir)
    val v = UnigramLm.learnVocab(docs)
    // every corpus code point is covered
    val corpusChars = docs.select(explode(split(regexp_replace(
        coalesce(col("text"), lit("")), " ", ""), "")).as("c"))
      .filter(col("c") =!= "").distinct().as[String].collect().toSet
    val singles = v.map(_.piece).filter(p => p.codePointCount(0, p.length) == 1).toSet
    assert(corpusChars.subsetOf(singles))
    // costs are the bitlen formula against the vocabulary total
    val tot = v.map(_.freq).sum
    def bl(n: Long) = if (n <= 0) 1L else (64 - java.lang.Long.numberOfLeadingZeros(n)).toLong
    v.foreach(p => assert(p.cost == bl(tot) - bl(p.freq)))
  }
}
