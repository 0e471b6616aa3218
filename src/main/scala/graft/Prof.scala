package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Scratch profiling main for the optimization round (guide §1): runs the
  * named registry queries with a listener that splits wall-clock into
  * driver-side gaps vs job execution, and reports per-job task counts and
  * task-time sums so the expensive stage is identifiable without the UI.
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.Prof <sfDir> q211,q204"
  * Optional 3rd arg "explain" dumps .explain("formatted") to plans/r21/. */
object Prof {
  final case class JobRec(id: Int, desc: String, start: Long, var end: Long,
      var nTasks: Int, var taskTimeMs: Long, var stages: Int,
      site: String = "")

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args(1).split(",").toSeq else Seq.empty
    val doExplain = args.length > 2 && args(2).contains("explain")
    val planSuffix =
      if (args.length > 2 && args(2).contains(":")) args(2).split(":")(1)
      else "before"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = mutable.ArrayBuffer.empty[JobRec]
    val stageToJob = mutable.Map.empty[Int, JobRec]
    // Listener callbacks and the main thread synchronize on ONE monitor
    // (`jobs`) — the r20 version synchronized callbacks on the listener
    // instance while the main thread locked `jobs`, so clear()/snapshot
    // raced concurrent callback mutation (round-20 advice).
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        val site = e.stageInfos.lastOption.map(_.name).getOrElse("")
        val r = JobRec(e.jobId, desc, e.time, e.time, 0, 0L, e.stageIds.size,
          site)
        jobs += r
        e.stageIds.foreach(sid => stageToJob(sid) = r)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.find(_.id == e.jobId).foreach(_.end = e.time)
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = jobs.synchronized {
        stageToJob.get(e.stageId).foreach { r =>
          r.nTasks += 1
          if (e.taskMetrics != null)
            r.taskTimeMs += e.taskMetrics.executorRunTime
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val entries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (k, _) => names.isEmpty || names.exists(k.startsWith) }
    entries.foreach { case (name, fn) =>
      // warm-up (codegen, footer reads) — same protocol as Bench
      try fn(spark, sfDir).count() catch { case e: Throwable =>
        println(s"[prof] $name WARMUP FAILED: $e"); }
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      jobs.synchronized { jobs.clear(); stageToJob.clear() }
      val t0 = System.nanoTime()
      val t0ms = System.currentTimeMillis()
      val n = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(100) // let job-end events drain
      val js = jobs.synchronized { jobs.toVector.sortBy(_.start) }
      val jobSpan = js.map(j => (j.end - j.start) / 1e3).sum
      val firstGap = if (js.nonEmpty) (js.head.start - t0ms) / 1e3 else wall
      // gaps between consecutive jobs (driver planning/decisions)
      val gaps = js.sliding(2).collect {
        case Vector(a, b) if b.start > a.end => (b.start - a.end) / 1e3
      }.sum
      println(f"[prof] $name%-32s wall=$wall%7.3f s  rows=$n%-8d jobs=${js.size}%3d  firstJobGap=$firstGap%6.3f  interJobGaps=$gaps%6.3f  jobSpanSum=$jobSpan%7.3f")
      js.foreach { j =>
        val d = (j.end - j.start) / 1e3
        if (d >= 0.05)
          println(f"[prof]    job ${j.id}%4d dur=$d%7.3f s tasks=${j.nTasks}%5d taskTime=${j.taskTimeMs / 1e3}%8.2f s stages=${j.stages}%2d site=${j.site.take(70)} desc=${j.desc.take(60)}")
      }
      if (doExplain) {
        val dir = java.nio.file.Paths.get("plans/r21")
        java.nio.file.Files.createDirectories(dir)
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          dir.resolve(s"${name}_$planSuffix.txt"), txt)
        println(s"[prof] wrote plans/r21/${name}_$planSuffix.txt")
      }
    }
    spark.stop()
  }
}
