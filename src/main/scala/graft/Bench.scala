package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: times every registry query at the given SF,
  * emitting ONE JSON line. Each query runs once untimed (codegen compile,
  * broadcast build, parquet footer reads), then THREE timed runs, and the
  * MEDIAN is reported — a single contended-host spike can no longer poison
  * the round's committed artifact (round 7 recorded 136.8 s for a tree that
  * reproduced at 59.9 s idle; the median of 3 sits inside the measured
  * variance band unless the whole window is contended). Failures are
  * surfaced in an "errors" map with value -1 — never silently timed.
  *
  * CONTENTION SENTINEL: the median cannot (and should not) hide a fully
  * contended 3-run window — round 8 committed 103.1 s for a tree that
  * reproduced at 65.3 s idle, and a judge had to re-run to adjudicate. The
  * artifact now self-diagnoses: a fixed-cost calibration probe (one timed
  * run of the warm q01 — a sub-second full-scan aggregate whose cost is
  * machine-constant on an idle host) executes at the START, MIDDLE and END
  * of the sweep; if the median probe exceeds 2× the best probe, the run is
  * stamped `"contended": true`. Per-query MINIMUM-of-3 timings ride along
  * in the file artifact ("queries_min") as the less contention-sensitive
  * secondary read. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => " "
      case c => c.toString
    }

    val entries = SparkEntry.queries.toSeq.sortBy(_._1)
    // Calibration probe: one timed run of the (warm) q01 aggregate.
    val probeFn = SparkEntry.queries.get("q01_daily_counts")
    def probe(): Double = probeFn.map { fn =>
      try {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      } catch { case _: Throwable => -1.0 }
    }.getOrElse(-1.0)
    probeFn.foreach(fn =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () })
    val pStart = probe()
    var pMid = -1.0

    val results = entries.zipWithIndex.map { case ((name, fn), i) =>
      // Several queries (q66/q70/q73/q76/q84) localCheckpoint their edge
      // lists; those block-manager blocks are reclaimed by ContextCleaner
      // only after the driver happens to GC the DataFrame refs — left
      // alone, ~90 queries of accumulated blocks add multi-second noise
      // to the iterative queries (q66 measured 2.6–7.7 s by position;
      // System.gc() between queries made it WORSE, 10 s spikes, by
      // pushing full-GC work into the timed runs). Synchronously drop
      // whatever the previous query left persisted instead — exact, no
      // GC storm, and each query starts from an empty block manager.
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      if (i == entries.size / 2) pMid = probe()
      def run(): Either[String, Long] =
        try Right(fn(spark, sfDir).count())
        catch { case e: Throwable => Left(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(160)}") }
      def timed(): Either[String, Double] = {
        val t0 = System.nanoTime()
        run().map(_ => (System.nanoTime() - t0) / 1e9)
      }
      run() match {
        case Left(err) => (name, -1.0, -1.0, Some(err))
        case Right(_) =>
          // Median of 3 timed runs (warm-up above not counted); the min
          // rides along in the file artifact as the contention-resistant
          // secondary read.
          val runs = List(timed(), timed(), timed())
          runs.collectFirst { case Left(err) => err } match {
            case Some(err) => (name, -1.0, -1.0, Some(err))
            case None =>
              val ts = runs.map(_.toOption.get).sorted
              (name, ts(1), ts.head, None)
          }
      }
    }
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    val pEnd = probe()
    val probes = Seq(pStart, pMid, pEnd).filter(_ >= 0).sorted
    // Contended = even the probe's MEDIAN ran 2× over the best probe this
    // window — fixed work, so only external load explains the drift.
    val contended = probes.nonEmpty && probes(probes.size / 2) > 2 * probes.head
    // Locale-pinned: f"$v%.3f" uses the default JVM locale, which under
    // e.g. de_DE emits "1,234" — invalid JSON.
    def ms(v: Double): String =
      if (v < 0) "-1"
      else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v, _, _) => "\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    val qsMin = results.map { case (k, _, mn, _) => "\"" + k + "\":" + ms(mn) }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, _, Some(e)) => "\"" + k + "\":\"" + esc(e) + "\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val sentinel = s""""probe":{"start":${ms(pStart)},"mid":${ms(pMid)},"end":${ms(pEnd)}},"contended":$contended"""
    val json =
      s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$qs,"queries_min":$qsMin,"errors":$errs,$sentinel,"sf":"$sfDir"}"""
    // Full-name per-query timings go to the file (the durable artifact).
    java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_out.json"), json)
    // Rounds 3 and 5 lost the stdout artifact to the driver's ~2 KB tail
    // capture: 80 full query names at 9 decimals is a >3 KB line. The
    // printed line therefore abbreviates each query to its "qNN" prefix
    // (unique by construction in Registry) and rounds to milliseconds,
    // keeping the complete object comfortably inside the tail window
    // (the sentinel adds ~70 chars; queries_min stays file-only).
    val shortQs = results.map { case (k, v, _, _) =>
      "\"" + k.takeWhile(_ != '_') + "\":" + ms(v)
    }.mkString("{", ",", "}")
    println(
      s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$shortQs,"errors":$errs,$sentinel,"sf":"$sfDir"}""")
    spark.stop()
  }
}
