package graft.llm

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/**
 * The unified lifecycle HEALTH DASHBOARD — one operator folding every
 * persisted index's `healthCheck` into a single long-format table
 * `(lifecycle, chk, ok, detail)`, one row per invariant: the scheduled-
 * monitor surface a fleet of index artifacts needs (SCALE.md's per-index
 * promise, delivered as one frame a job can land/alert on instead of
 * seven differently-shaped reports).
 *
 * Scope: INVARIANT checks only — the facts a serve path would throw on
 * (manifest/stamp agreement, content signatures, shape/formula
 * validity), each reported as a boolean with an optional model-sized
 * numeric `detail`. Profile METRICS (dedup band skew, decon dup-row
 * counts, classifier class masses) stay in the per-index healthChecks:
 * they are observability readings with corpus-dependent values, not
 * pass/fail invariants.
 *
 * Cost shape: every per-index healthCheck is model-sized by contract
 * (1 row, or ≤ bands rows for dedup), so collecting them driver-side
 * and emitting one literal frame is O(lifecycles) metadata work — no
 * corpus scan beyond what the healthChecks themselves read.
 *
 * Reference behavior: the reference exposes liveness/health over HTTP
 * (server/app/healthcheck.go); this is the analog for the engine's
 * persisted index artifacts.
 */
object IndexHealth {

  /** The index kinds the dashboard can fold; maps 1:1 onto the seven
    * persisted lifecycles. */
  sealed trait Kind
  case object Unigram extends Kind
  case object BpeK extends Kind
  case object Ivf extends Kind
  case object Dedup extends Kind
  case object Decon extends Kind
  case object Dsir extends Kind
  case object Classifier extends Kind

  private final case class Check(chk: String, ok: Boolean,
      detail: Option[Long])

  private def nStale(r: Row): Long = {
    val s = r.getAs[String]("stale_tables")
    if (s.isEmpty) 0L else s.split(",").length.toLong
  }
  private def staleCheck(r: Row): Check =
    Check("stale", r.getAs[String]("stale_tables").isEmpty, Some(nStale(r)))
  private def manifestCheck(r: Row): Check =
    Check("manifest", r.getAs[Boolean]("has_manifest"), None)
  /** Writer-lease row (round 20): ok = no LIVE lease (quiescent index or
    * a stale/crashed holder — either way a new maintenance job could
    * acquire); detail = holder age in seconds when a lease file exists.
    * A false here means a writer is active RIGHT NOW — schedule-collision
    * visibility the after-the-fact stale/sig checks cannot give. */
  private def leaseCheck(spark: SparkSession, dir: String): Check = {
    val st = WriterLease.status(spark, dir)
    Check("lease", !st.live, st.ageMs.map(_ / 1000))
  }

  private def melt(spark: SparkSession, kind: Kind,
      dir: String): Seq[Check] = kind match {
    case Unigram =>
      val r = UnigramIndex.healthCheck(spark, dir).head()
      Seq(
        Check("n_stored", r.getAs[Boolean]("n_ok"),
          Some(r.getAs[Long]("n_stored"))),
        Check("sig", r.getAs[Boolean]("sig_ok"), None),
        Check("unique", r.getAs[Boolean]("unique_ok"), None),
        Check("cost", r.getAs[Boolean]("cost_ok"), None),
        manifestCheck(r), staleCheck(r), leaseCheck(spark, dir),
        Check("healthy", r.getAs[Boolean]("healthy"),
          Some(r.getAs[Long]("n_pieces"))))
    case BpeK =>
      val r = BpeIndex.healthCheck(spark, dir).head()
      Seq(
        Check("k", r.getAs[Boolean]("k_ok"), Some(r.getAs[Int]("k").toLong)),
        Check("sep", r.getAs[Boolean]("sep_ok"), None),
        Check("sig", r.getAs[Boolean]("sig_ok"), None),
        Check("ranks", r.getAs[Boolean]("ranks_ok"), None),
        Check("pretok", r.getAs[Boolean]("pretok_ok"), None),
        manifestCheck(r), staleCheck(r), leaseCheck(spark, dir),
        Check("healthy", r.getAs[Boolean]("healthy"),
          Some(r.getAs[Long]("n_merges"))))
    case Ivf =>
      val r = IvfIndex.healthCheck(spark, dir).head()
      Seq(manifestCheck(r), staleCheck(r), leaseCheck(spark, dir),
        Check("healthy", r.getAs[Boolean]("healthy"),
          Some(r.getAs[Long]("n_tables"))))
    case Dedup =>
      val rows = DedupIndex.healthCheck(spark, dir).collect()
      require(rows.nonEmpty, s"dedup index at '$dir' reported no bands")
      val r = rows.head
      val docs = r.getAs[Long]("docs_indexed")
      val manifest = r.getAs[Boolean]("has_manifest")
      val staleOk = r.getAs[String]("stale_tables").isEmpty
      Seq(manifestCheck(r), staleCheck(r), leaseCheck(spark, dir),
        Check("docs_indexed", docs > 0, Some(docs)),
        Check("bands", rows.length > 0, Some(rows.length.toLong)),
        Check("healthy", manifest && staleOk && docs > 0, Some(docs)))
    case Decon =>
      val r = DeconIndex.healthCheck(spark, dir).head()
      val manifest = r.getAs[Boolean]("has_manifest")
      val staleOk = r.getAs[String]("stale_tables").isEmpty
      Seq(manifestCheck(r), staleCheck(r), leaseCheck(spark, dir),
        Check("healthy", manifest && staleOk, None))
    case Dsir =>
      val r = DsirIndex.healthCheck(spark, dir).head()
      Seq(
        Check("bins", r.getAs[Boolean]("bins_ok"), None),
        Check("range", r.getAs[Boolean]("range_ok"), None),
        Check("sig", r.getAs[Boolean]("sig_ok"), None),
        Check("tok", r.getAs[Boolean]("tok_ok"), None),
        manifestCheck(r), staleCheck(r), leaseCheck(spark, dir),
        Check("healthy", r.getAs[Boolean]("healthy"),
          Some(r.getAs[Int]("buckets").toLong)))
    case Classifier =>
      val r = ClassifierIndex.healthCheck(spark, dir).head()
      Seq(
        Check("one_row", r.getAs[Boolean]("one_row"),
          Some(r.getAs[Long]("model_rows"))),
        Check("sig", r.getAs[Boolean]("sig_ok"), None),
        manifestCheck(r), staleCheck(r), leaseCheck(spark, dir),
        Check("healthy", r.getAs[Boolean]("healthy"),
          Some(r.getAs[Long]("threshold_permille"))))
  }

  /** Fold the given `(lifecycle, kind, dir)` triples into the dashboard
    * frame `(lifecycle, chk, ok, detail)`, (lifecycle, chk)-ordered.
    * `chk` not `check` — the natural name is a reserved word in ANSI
    * SQL, and this frame exists to be landed as a table. */
  def dashboard(spark: SparkSession,
      indexes: Seq[(String, Kind, String)]): DataFrame = {
    import spark.implicits._
    indexes.flatMap { case (lifecycle, kind, dir) =>
      melt(spark, kind, dir).map(c =>
        (lifecycle, c.chk, c.ok, c.detail))
    }.toDF("lifecycle", "chk", "ok", "detail")
      .orderBy("lifecycle", "chk")
  }
}
