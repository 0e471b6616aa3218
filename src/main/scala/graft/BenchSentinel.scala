package graft

/** Pure contention-detection logic for [[Bench]] — no Spark, fully
  * unit-testable on synthetic timing series (BenchSentinelSpec).
  *
  * Three independent detectors, each closing a hole a past round walked
  * through:
  *
  *  1. PROBE SPIKE (round 12's hole): the old rule compared the probe
  *     MEDIAN to the min, so a single spiked probe — r12's final probe
  *     read 4.609 s vs a 0.526 s min, 8.8× — never fired. Now ANY probe
  *     exceeding 2.5× the min probe (with a 0.25 s absolute floor so a
  *     50 ms→130 ms jitter on a fast host doesn't flag) marks the run
  *     contended AND identifies WHICH probe spiked.
  *  2. WINDOW FLAGGING (locates the episode in time): probes are
  *     chronological and every query records which inter-probe interval
  *     it ran in. When probe k spikes, every query in interval k-1 or k
  *     (i.e. bracketed by the spiked probe on either side) is flagged —
  *     contention comes in multi-minute episodes, so a spiked probe
  *     implicates its whole neighborhood, not just itself. This is what
  *     the per-query min-of-3 rule cannot do when all three runs sit
  *     inside one episode (r12's q98: 11.1 s median, 9.4 s min, both
  *     contaminated, rule silent).
  *  3. REGRESSION DIFF (cross-round memory): a query whose median moved
  *     >3× vs the previous committed bench_out.json (0.2 s absolute
  *     floor) is listed in "regressed" — either a real regression or
  *     contention the other two detectors missed; both deserve a human
  *     look before the artifact is trusted.
  */
object BenchSentinel {
  /** Indices of probes that individually spiked: > 2.5× the min probe
    * and > 0.25 s over it. Negative probes (failed) are ignored both as
    * candidates and for the min. */
  def spikedProbes(probes: Seq[Double]): Set[Int] = {
    val valid = probes.filter(_ >= 0)
    if (valid.isEmpty) Set.empty
    else {
      val mn = valid.min
      probes.zipWithIndex.collect {
        case (p, i) if p >= 0 && p > 2.5 * mn && p - mn > 0.25 => i
      }.toSet
    }
  }

  /** Run-level contention stamp: fires on the old median rule (whole
    * window drifted 2× — r8's failure mode) OR on any single spiked
    * probe (r12's failure mode). */
  def contended(probes: Seq[Double]): Boolean = {
    val valid = probes.filter(_ >= 0).sorted
    val medianRule = valid.nonEmpty && valid(valid.size / 2) > 2 * valid.head
    medianRule || spikedProbes(probes).nonEmpty
  }

  /** Queries flagged by location: query q ran in inter-probe interval
    * `interval(q)` (= number of probes already taken when q started,
    * minus 1 — interval k is bracketed by probes k and k+1). Flag q if
    * either bracketing probe spiked. Intervals past the last probe are
    * bracketed on the left only. */
  def windowFlagged(intervals: Seq[(String, Int)], spiked: Set[Int]): Seq[String] =
    if (spiked.isEmpty) Nil
    else intervals.collect {
      case (name, k) if spiked.contains(k) || spiked.contains(k + 1) => name
    }

  /** Queries whose median moved >3× vs the previous committed artifact
    * (with a 0.2 s absolute floor). Queries absent from the previous map
    * (new this round) or with failed timings never flag. */
  def regressionFlagged(current: Seq[(String, Double)],
                        previous: Map[String, Double]): Seq[String] =
    current.collect {
      case (name, v) if v >= 0 && previous.get(name).exists(p =>
        p >= 0 && v > 3 * p && v - p > 0.2) => name
    }

  /** Minimal extractor for the `"queries":{...}` map of a previous
    * bench_out.json — the only JSON this repo ever reads back. Pure
    * string scanning (no JSON lib in the dependency set); tolerant of
    * absence: any parse failure yields an empty map, which disables the
    * regression detector rather than failing the bench. */
  def parsePrevQueries(json: String): Map[String, Double] = {
    val start = json.indexOf("\"queries\":{")
    if (start < 0) Map.empty
    else {
      val body = json.substring(start + "\"queries\":{".length)
      val end = body.indexOf('}')
      if (end < 0) Map.empty
      else body.substring(0, end).split(',').iterator.flatMap { kv =>
        kv.split(':') match {
          case Array(k, v) =>
            val key = k.trim.stripPrefix("\"").stripSuffix("\"")
            v.trim.toDoubleOption.map(key -> _)
          case _ => None
        }
      }.toMap
    }
  }
}
