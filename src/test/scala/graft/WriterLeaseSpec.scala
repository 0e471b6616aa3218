package graft

import java.nio.file.Files

import graft.llm.{IndexHealth, UnigramIndex, WriterLease}
import graft.model.Tables
import org.apache.spark.sql.functions._

/**
 * Writer-lease specs (round 20): the PREVENTION layer in front of
 * SwapManifest's torn-swap detection — a second concurrent builder
 * refuses while a lease is live, a crashed holder's stale lease is
 * recoverable, releases are owner-checked, every lifecycle mutator
 * actually takes the lease, and the health dashboard reports it.
 */
class WriterLeaseSpec extends SparkSpec {

  private def freshDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("second acquire refuses while the lease is live; release frees it") {
    val dir = freshDir("graft_lease_live")
    val l1 = WriterLease.acquire(spark, dir, "job-a")
    val e = intercept[IllegalStateException](
      WriterLease.acquire(spark, dir, "job-b"))
    assert(e.getMessage.contains("HELD") && e.getMessage.contains("job-a"))
    WriterLease.release(spark, l1)
    // freed: a new writer acquires without contest
    val l2 = WriterLease.acquire(spark, dir, "job-b")
    WriterLease.release(spark, l2)
  }

  test("a stale lease (crashed holder) is recoverable; release is " +
      "owner-checked so the dead holder cannot evict the new one") {
    val dir = freshDir("graft_lease_stale")
    val dead = WriterLease.acquire(spark, dir, "crashed-job")
    // no release — the holder 'crashed'. A recoverer with a ttl shorter
    // than the lease's age takes over.
    Thread.sleep(30)
    val l2 = WriterLease.acquire(spark, dir, "recovery-job", ttlMs = 10)
    // the dead holder's release must NOT delete the recoverer's lease
    WriterLease.release(spark, dead)
    val st = WriterLease.status(spark, dir)
    assert(st.present && st.job === Some("recovery-job"),
      s"owner check failed: $st")
    WriterLease.release(spark, l2)
    assert(!WriterLease.status(spark, dir).present)
  }

  test("a malformed (torn) lease file counts as stale, not as a holder") {
    val dir = freshDir("graft_lease_torn")
    Files.write(java.nio.file.Paths.get(dir, WriterLease.LeaseName),
      "garbage".getBytes("UTF-8"))
    val st = WriterLease.status(spark, dir)
    assert(st.present && !st.live)
    val l = WriterLease.acquire(spark, dir, "job-c") // recovers
    WriterLease.release(spark, l)
  }

  test("lifecycle mutators refuse under a foreign live lease and release " +
      "their own on completion (unigram build end-to-end)") {
    val dir = freshDir("graft_lease_ug")
    val docs = Tables.documents(spark, sfDir)
    val held = WriterLease.acquire(spark, dir, "stuck-maintenance")
    val e = intercept[IllegalStateException](UnigramIndex.build(docs, dir))
    assert(e.getMessage.contains("HELD"))
    WriterLease.release(spark, held)
    UnigramIndex.build(docs, dir) // acquires, builds, releases
    assert(!WriterLease.status(spark, dir).present,
      "build did not release its lease")
    // and the artifact it left is healthy + servable
    assert(UnigramIndex.healthCheck(spark, dir).head()
      .getAs[Boolean]("healthy"))
  }

  test("dashboard gains the lease row: ok=true quiescent, ok=false with " +
      "a live holder (age in detail)") {
    val dir = freshDir("graft_lease_dash")
    UnigramIndex.build(Tables.documents(spark, sfDir), dir)
    def leaseRow() = IndexHealth.dashboard(spark,
      Seq(("unigram", IndexHealth.Unigram, dir)))
      .filter(col("chk") === "lease").collect()
    val quiet = leaseRow()
    assert(quiet.length === 1 && quiet.head.getBoolean(2) &&
      quiet.head.isNullAt(3), s"quiescent lease row wrong: ${quiet.toSeq}")
    val held = WriterLease.acquire(spark, dir, "long-running-rebuild")
    val busy = leaseRow()
    assert(busy.length === 1 && !busy.head.getBoolean(2) &&
      !busy.head.isNullAt(3) && busy.head.getLong(3) >= 0,
      s"live lease row wrong: ${busy.toSeq}")
    WriterLease.release(spark, held)
  }
}
