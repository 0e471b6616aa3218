package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TimeMode, TTLConfig, ValueState}

/**
 * The per-source corpus report card ([[graft.llm.TextAnalysis
 * .corpusReport]], q121) as an UPDATE-mode streaming aggregation — the
 * place an ingest actually runs it: every micro-batch emits the updated
 * running report row for each source it touched, so the monitoring
 * table converges on exactly the batch report of everything ingested so
 * far (StreamingSpec pins streaming-after-N-batches ≡ batch-on-union).
 *
 * Shape: the per-row features (token count, fingerprint, integer-scaled
 * quality) are [[graft.llm.TextAnalysis.reportFeatures]] — the SAME
 * scan-stage expressions as the batch report, computed before any
 * state — and the stateful part runs on `transformWithState`
 * ([[TwsCounters]]'s API tier) keyed by source. Per-key state: four
 * longs + the fingerprint-count map + the language set. The map IS the
 * cost of EXACT duplicate counting (state ∝ distinct fingerprints per
 * source, RocksDB-backed); that is the right trade for the per-ingest
 * monitor, which is bounded by the ingest window — the batch report
 * stays the full-corpus path, and a years-running deployment bounds the
 * map with the `fpTtl` lever ([[TwsCounters]]' TTL pattern): expired
 * fingerprints make a re-seen document count as first-seen, so dup
 * counts degrade CONSERVATIVELY (undercount, never crash, never
 * overcount — StreamingSpec pins this), while the scalar totals and the
 * language set keep TTL NONE and stay exact forever (they are O(1) and
 * O(langs) per key; expiring them would corrupt running totals, not
 * bound anything worth bounding).
 *
 * Determinism: counts are exact integers; mean_quality replays the
 * batch side's exact IEEE ops (floor(x·10⁴ + 0.5)/10⁴ over
 * q_sum/(n_docs·10⁴)) — bit-identical to [[graft.llm.TextFunctions
 * .fround]] on the same values.
 */
object StreamReport {

  /** Null-language sentinel: batch `groupBy(lang)` counts NULL as its
    * own group, but a state-store map key cannot be null — NULL langs
    * map to this value (assumed absent from real label sets). */
  val NullLang = "\u0000"

  final case class DocFeat(grp: String, lang: String, n_tokens: Long,
      fp: Long, qs: Long)
  final case class ReportRow(source: String, n_docs: Long, n_tokens: Long,
      n_dup_docs: Long, n_langs: Long, mean_quality: Double)

  final class ReportProcessor(fpTtl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[String, DocFeat, ReportRow] {
    @transient private var nDocs: ValueState[Long] = _
    @transient private var nToks: ValueState[Long] = _
    @transient private var qSum: ValueState[Long] = _
    @transient private var nDup: ValueState[Long] = _
    @transient private var nLangs: ValueState[Long] = _
    @transient private var fps: MapState[Long, Long] = _
    @transient private var langs: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val none = TTLConfig.NONE
      nDocs = getHandle.getValueState[Long]("nDocs", Encoders.scalaLong, none)
      nToks = getHandle.getValueState[Long]("nToks", Encoders.scalaLong, none)
      qSum = getHandle.getValueState[Long]("qSum", Encoders.scalaLong, none)
      nDup = getHandle.getValueState[Long]("nDup", Encoders.scalaLong, none)
      nLangs = getHandle.getValueState[Long]("nLangs", Encoders.scalaLong, none)
      // the ONE unbounded cell gets the TTL; expiry only weakens dup
      // detection (conservatively), never the running totals
      fps = getHandle.getMapState[Long, Long]("fps",
        Encoders.scalaLong, Encoders.scalaLong, fpTtl)
      langs = getHandle.getMapState[String, Long]("langs",
        Encoders.STRING, Encoders.scalaLong, none)
    }

    override def handleInputRows(key: String, rows: Iterator[DocFeat],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[ReportRow] = {
      var d = if (nDocs.exists()) nDocs.get() else 0L
      var t = if (nToks.exists()) nToks.get() else 0L
      var q = if (qSum.exists()) qSum.get() else 0L
      var dup = if (nDup.exists()) nDup.get() else 0L
      var nl = if (nLangs.exists()) nLangs.get() else 0L
      rows.foreach { r =>
        d += 1; t += r.n_tokens; q += r.qs
        val seen = if (fps.containsKey(r.fp)) fps.getValue(r.fp) else 0L
        if (seen > 0) dup += 1
        fps.updateValue(r.fp, seen + 1)
        if (!langs.containsKey(r.lang)) { nl += 1; langs.updateValue(r.lang, 1L) }
      }
      nDocs.update(d); nToks.update(t); qSum.update(q)
      nDup.update(dup); nLangs.update(nl)
      // the batch report's fround(q_sum / (n_docs * 10^4), 4) replayed
      // with the same IEEE double ops
      val x = q.toDouble / (d.toDouble * 10000d)
      val mean = math.floor(x * 10000d + 0.5) / 10000d
      Iterator.single(ReportRow(key, d, t, dup, nl, mean))
    }
  }

  /** Update-mode running report per `groupCol`; input is any (streaming)
    * docs frame with (doc_id, groupCol, lang, text). RocksDB state store
    * required (transformWithState's provider contract). `fpTtl` bounds
    * the fingerprint map for years-running deployments (state TTL needs
    * processing-time semantics, so a non-NONE TTL switches the TimeMode
    * accordingly; everything else is time-independent). */
  def streamingReport(docs: DataFrame, groupCol: String = "source",
      fpTtl: TTLConfig = TTLConfig.NONE)(
      implicit spark: SparkSession): Dataset[ReportRow] = {
    import spark.implicits._
    val timeMode =
      if (fpTtl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    graft.llm.TextAnalysis.reportFeatures(docs, groupCol)
      .select(col(groupCol).as("grp"),
        coalesce(col("lang"), lit(NullLang)).as("lang"),
        col("n_tokens"), col("fp"), col("qs")).as[DocFeat]
      .groupByKey(_.grp)
      .transformWithState(new ReportProcessor(fpTtl), timeMode,
        OutputMode.Update())
  }
}
