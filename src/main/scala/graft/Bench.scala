package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: times every registry query at the given SF,
  * emitting ONE JSON line. Each query runs once untimed (codegen compile,
  * broadcast build, parquet footer reads) and the SECOND run is reported,
  * so no query absorbs warm-up cost by alphabetical accident. Failures are
  * surfaced in an "errors" map with value -1 — never silently timed. */
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

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def run(): Either[String, Long] =
        try Right(fn(spark, sfDir).count())
        catch { case e: Throwable => Left(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(160)}") }
      run() match {
        case Left(err) => (name, -1.0, Some(err))
        case Right(_) =>
          val t0 = System.nanoTime()
          run() match {
            case Left(err) => (name, -1.0, Some(err))
            case Right(_) => (name, (System.nanoTime() - t0) / 1e9, None)
          }
      }
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => "\"" + k + "\":\"" + esc(e) + "\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    // Round 3's stdout-only line was truncated by the driver's tail capture
    // (log noise + one giant line); the file copy is the durable artifact.
    java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_out.json"), json)
    println(json)
    spark.stop()
  }
}
