package graft

/**
 * Pins the per-invocation scratch reap for the streaming commit-path
 * registry queries (round-17 advice): each invocation of
 * q197/q203/q208/q215 creates fresh land/checkpoint temp dirs (a reused
 * checkpoint would replay nothing), and before this round they were
 * reaped only by the JVM shutdown hook — a long-lived session grew /tmp
 * by one corpus copy per invocation. Now the query body pins its result
 * (eager localCheckpoint) and deletes its own dirs before returning, so
 * the /tmp footprint is CONSTANT across invocations and the returned
 * frame stays fully usable after the delete.
 */
class ScratchReapSpec extends SparkSpec {

  private def tmpDirsWith(prefix: String): Set[String] = {
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    Option(tmp.list()).getOrElse(Array.empty[String])
      .filter(_.startsWith(prefix)).toSet
  }

  test("q197/q215: repeated invocations leave zero new scratch dirs and a usable result") {
    for ((qname, prefix) <- Seq(
        "q197_stream_ingest_dedup" -> "graft_q197_",
        "q215_stream_quality_gate" -> "graft_q215_",
        "q226_stream_shard_land" -> "graft_q226_",
        "q228_stream_unigram_drift" -> "graft_q228_")) {
      val before = tmpDirsWith(prefix)
      val r1 = SparkEntry.queries(qname)(spark, sfDir)
      // the land/ckpt dirs are already gone when the body returns, and
      // the pinned frame must not need them
      assert(tmpDirsWith(prefix) == before,
        s"$qname invocation 1 leaked scratch dirs")
      val n1 = r1.count()
      assert(n1 > 0, s"$qname returned an empty frame")
      val r2 = SparkEntry.queries(qname)(spark, sfDir)
      assert(tmpDirsWith(prefix) == before,
        s"$qname invocation 2 leaked scratch dirs")
      assert(r2.count() == n1, s"$qname is not invocation-stable")
    }
  }
}
