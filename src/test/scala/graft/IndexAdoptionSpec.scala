package graft

import graft.llm.{ClassifierIndex, DeconIndex, DedupIndex, DsirIndex, SwapManifest}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/**
 * One-shot manifest ADOPTION for pre-manifest index artifacts — the
 * migration path the r18 hardening needs: requiring a swap manifest on
 * every serve/append path makes indexes persisted before that layout
 * throw on first read; `adoptManifest` stamps + manifests a
 * verified-consistent table set without a rebuild. Pinned here for all
 * four lifecycles the hardening touched: the refusal before adoption,
 * answer identity after it, idempotence refusal (a live manifest must
 * never be re-blessed), and content-torn refusal.
 */
class IndexAdoptionSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toSeq.toDF("doc_id", "text")

  /** Simulate a pre-manifest artifact: drop the manifest + every stamp. */
  private def stripManifest(dir: String, tables: Seq[String]): Unit = {
    val fs = SwapManifest.fsOf(spark, dir)
    fs.delete(new Path(s"$dir/${SwapManifest.ManifestName}"), false)
    tables.foreach(t =>
      fs.delete(new Path(s"$dir/$t/${SwapManifest.VersionName}"), false))
  }

  private def collected(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  test("DedupIndex: pre-manifest artifact refuses, adopt restores serving") {
    val corpus = docs(1L -> "alpha beta gamma delta epsilon",
      2L -> "one two three four five six")
    val batch = docs(3L -> "alpha beta gamma delta epsilon",
      4L -> "totally novel content here now")
    val dir = java.nio.file.Files.createTempDirectory("adopt_dedup").toString
    DedupIndex.build(corpus, dir)
    val before = collected(DedupIndex.probe(batch, dir))
    stripManifest(dir, Seq("bands", "shingles", "sizes", "fingerprints",
      "ids", "params"))
    val e = intercept[IllegalStateException](DedupIndex.probe(batch, dir))
    assert(e.getMessage.contains("no swap manifest"))
    DedupIndex.adoptManifest(spark, dir)
    assert(collected(DedupIndex.probe(batch, dir)) === before)
    // a live manifest is never re-blessed
    val e2 = intercept[IllegalArgumentException](
      DedupIndex.adoptManifest(spark, dir))
    assert(e2.getMessage.contains("already has a swap manifest"))
  }

  test("DedupIndex: adoption refuses a missing table") {
    val corpus = docs(1L -> "alpha beta gamma delta epsilon")
    val dir = java.nio.file.Files.createTempDirectory("adopt_dedup2").toString
    DedupIndex.build(corpus, dir)
    stripManifest(dir, Seq("bands", "shingles", "sizes", "fingerprints",
      "ids", "params"))
    val fs = SwapManifest.fsOf(spark, dir)
    fs.delete(new Path(s"$dir/sizes"), true)
    val e = intercept[IllegalArgumentException](
      DedupIndex.adoptManifest(spark, dir))
    assert(e.getMessage.contains("missing table") &&
      e.getMessage.contains("sizes"))
  }

  test("DeconIndex: pre-manifest artifact refuses, adopt restores serving") {
    val bench = docs(1L -> "the quick brown fox jumps over the lazy dog")
    val corpus = docs(10L -> "the quick brown fox jumps over the lazy dog",
      11L -> "completely unrelated training text rows")
    val dir = java.nio.file.Files.createTempDirectory("adopt_decon").toString
    DeconIndex.build(bench, dir, n = 5)
    val before = collected(DeconIndex.probe(corpus, dir))
    stripManifest(dir, Seq("fingerprints", "grams", "prints", "params"))
    val e = intercept[IllegalStateException](DeconIndex.probe(corpus, dir))
    assert(e.getMessage.contains("no swap manifest"))
    DeconIndex.adoptManifest(spark, dir)
    assert(collected(DeconIndex.probe(corpus, dir)) === before)
    intercept[IllegalArgumentException](DeconIndex.adoptManifest(spark, dir))
  }

  test("ClassifierIndex: adopt verifies content outright; a torn model refuses") {
    val d = docs(1L -> "a long and carefully written paragraph of text",
      2L -> "!!", 3L -> "another reasonably long and wordy document here",
      4L -> "##")
    val dir = java.nio.file.Files.createTempDirectory("adopt_clf").toString
    ClassifierIndex.build(d, dir)
    val probe = docs(7L -> "a carefully written paragraph", 8L -> "%%")
    val before = collected(ClassifierIndex.score(spark, dir, probe))
    stripManifest(dir, Seq("model", "params"))
    val e = intercept[IllegalStateException](
      ClassifierIndex.score(spark, dir, probe))
    assert(e.getMessage.contains("no swap manifest"))
    ClassifierIndex.adoptManifest(spark, dir)
    assert(collected(ClassifierIndex.score(spark, dir, probe)) === before)
    intercept[IllegalArgumentException](
      ClassifierIndex.adoptManifest(spark, dir))
    // content-torn: duplicate the model row, strip again, adoption refuses
    val model = spark.read.parquet(s"$dir/model")
    model.union(model).write.mode("overwrite")
      .parquet(s"$dir/model__dup")
    val fs = SwapManifest.fsOf(spark, dir)
    fs.delete(new Path(s"$dir/model"), true)
    fs.rename(new Path(s"$dir/model__dup"), new Path(s"$dir/model"))
    stripManifest(dir, Seq("model", "params"))
    val e2 = intercept[IllegalArgumentException](
      ClassifierIndex.adoptManifest(spark, dir))
    assert(e2.getMessage.contains("torn"))
  }

  test("IndexHealth.dashboard: melts healthy and torn lifecycles into one frame") {
    import graft.llm.IndexHealth
    val d = docs(1L -> "a long and carefully written paragraph of text",
      2L -> "!!", 3L -> "another reasonably long and wordy document here")
    val ok = java.nio.file.Files.createTempDirectory("dash_ok").toString
    val torn = java.nio.file.Files.createTempDirectory("dash_torn").toString
    ClassifierIndex.build(d, ok)
    ClassifierIndex.build(d, torn)
    val fs = SwapManifest.fsOf(spark, torn)
    val out = fs.create(new Path(s"$torn/model/${SwapManifest.VersionName}"),
      true)
    try out.write("tampered".getBytes("UTF-8")) finally out.close()
    val rows = IndexHealth.dashboard(spark, Seq(
      ("clf_ok", IndexHealth.Classifier, ok),
      ("clf_torn", IndexHealth.Classifier, torn)))
      .collect().map(r => (r.getString(0), r.getString(1), r.getBoolean(2)))
    // healthy fixture: every check green; torn fixture: content checks
    // stay green, stamp agreement and the conjunction flip
    assert(rows.filter(_._1 == "clf_ok").forall(_._3))
    val tornMap = rows.filter(_._1 == "clf_torn")
      .map(t => t._2 -> t._3).toMap
    assert(tornMap("one_row") && tornMap("sig") && tornMap("manifest"))
    assert(!tornMap("stale") && !tornMap("healthy"))
    // long format: (lifecycle, chk) unique, ordered
    assert(rows.map(t => (t._1, t._2)).distinct.length == rows.length)
  }

  test("DsirIndex: adopt runs the content checks; a drifted count table refuses") {
    val pool = docs(1L -> "alpha beta gamma delta", 2L -> "one two three",
      3L -> "alpha one beta two")
    val target = docs(100L -> "alpha beta gamma delta")
    val dir = java.nio.file.Files.createTempDirectory("adopt_dsir").toString
    DsirIndex.build(pool, target, dir, buckets = 64)
    val probe = docs(7L -> "alpha beta something", 8L -> "one two other")
    val before = collected(DsirIndex.score(spark, dir, probe))
    stripManifest(dir, Seq("target_counts", "raw_counts", "params"))
    val e = intercept[IllegalStateException](
      DsirIndex.score(spark, dir, probe))
    assert(e.getMessage.contains("no swap manifest"))
    DsirIndex.adoptManifest(spark, dir)
    assert(collected(DsirIndex.score(spark, dir, probe)) === before)
    intercept[IllegalArgumentException](DsirIndex.adoptManifest(spark, dir))
    // content-torn: drop a raw-count row, strip, adoption refuses on the
    // bin-count/signature check — never blesses a torn artifact
    val cr = spark.read.parquet(s"$dir/raw_counts")
    cr.limit(math.max(cr.count().toInt - 1, 0)).write.mode("overwrite")
      .parquet(s"$dir/raw_counts__cut")
    val fs = SwapManifest.fsOf(spark, dir)
    fs.delete(new Path(s"$dir/raw_counts"), true)
    fs.rename(new Path(s"$dir/raw_counts__cut"),
      new Path(s"$dir/raw_counts"))
    stripManifest(dir, Seq("target_counts", "raw_counts", "params"))
    val e2 = intercept[IllegalArgumentException](
      DsirIndex.adoptManifest(spark, dir))
    assert(e2.getMessage.contains("torn"))
  }
}
