package graft

/** Pure pair-selection arithmetic for the two-level scaling measurements —
  * shared by [[Bench]] (the local[] single-JVM proxy) and [[ClusterScale]]
  * (separate executor JVMs), extracted so the selection policy is
  * unit-testable without running Spark (round-5 VERDICT #2).
  *
  * A "pair" is one low-parallelism run and the adjacent high-parallelism
  * run of the same job: both share one host-weather window, so a storm that
  * slows both cancels in the efficiency ratio. Two failure modes must not
  * produce a silently-published number:
  *
  *  - '''low-side-only storm''': the ratio reads superlinear (> 1.02 —
  *    physically implausible for this workload), so such pairs are excluded
  *    from selection;
  *  - '''symmetric storm''' (the BENCH_r05 blind spot): both sides slow
  *    together, the ratio degrades smoothly (memory-bandwidth contention
  *    hits the wide side harder), and the pair LOOKS plausible while
  *    measuring the co-tenants, not the engine. BENCH_r05 published local
  *    pairs [0.361, 0.267] with `storm_annotation:false` this way. The fix:
  *    plausibility also requires the pair's high-side ABSOLUTE throughput to
  *    clear `thrFloor` — a fraction of the quiet-window band recorded in
  *    BENCH.md. A degraded window fails the floor, triggers extra draws,
  *    and on budget exhaustion the JSON carries an explicit storm
  *    annotation instead of a bad number.
  *
  * `thrFloor` defaults live with the callers (env-overridable; they encode
  * THIS host's measured quiet band, BENCH.md "Separate-JVM scaling" /
  * round-4 previews). A floor of 0 disables the absolute check — callers
  * set that automatically when the run shape differs from the banded
  * default configuration.
  */
object PairSelect {

  /** One (low, high) measurement pair. Throughput unit is items/sec with
    * `items` whatever the caller counts (triples here). */
  final case class PairStats(secsLow: Double, itemsLow: Long, stealLow: Double,
      secsHigh: Double, itemsHigh: Long, stealHigh: Double) {
    def thrLow: Double = itemsLow / secsLow
    def thrHigh: Double = itemsHigh / secsHigh
  }

  /** Superlinear cutoff: a pair whose efficiency exceeds this measured a
    * low-side-only storm, not the engine. */
  val SUPERLINEAR = 1.02

  /** Scaling efficiency of a pair at core ratio `ratio` (= high/low). */
  def eff(p: PairStats, ratio: Double): Double =
    p.thrHigh / (p.thrLow * ratio)

  /** Plausible = physically sane ratio AND a quiet-enough window (high-side
    * absolute throughput at or above `thrFloor`; 0 disables). */
  def plausible(p: PairStats, ratio: Double, thrFloor: Double): Boolean =
    eff(p, ratio) <= SUPERLINEAR && p.thrHigh >= thrFloor

  def plausibleEffs(pairs: Seq[PairStats], ratio: Double, thrFloor: Double): Seq[Double] =
    pairs.filter(plausible(_, ratio, thrFloor)).map(eff(_, ratio)).sorted

  /** Median of the plausible pairs' efficiencies (lower median for even
    * counts — the conservative side). None when no pair is plausible. */
  def median(pairs: Seq[PairStats], ratio: Double, thrFloor: Double): Option[Double] = {
    val p = plausibleEffs(pairs, ratio, thrFloor)
    if (p.isEmpty) None else Some(p((p.length - 1) / 2))
  }

  /** The pair to publish throughput absolutes from: the best plausible pair
    * (the quietest observed window is the least-biased estimator — weather
    * only deflates). With NO plausible pair the fallback is the pair
    * CLOSEST to physical — the max-eff pair among the sane-ratio ones
    * (symmetric storm: all under the floor, the least-degraded reading) or,
    * when every pair is superlinear, the min-eff one (the least inflated).
    * Callers MUST pair this fallback with `storm = true`. */
  def best(pairs: Seq[PairStats], ratio: Double, thrFloor: Double): PairStats = {
    require(pairs.nonEmpty, "no measurement pairs")
    val p = pairs.filter(plausible(_, ratio, thrFloor))
    if (p.nonEmpty) p.maxBy(eff(_, ratio))
    else {
      val sane = pairs.filter(eff(_, ratio) <= SUPERLINEAR)
      if (sane.nonEmpty) sane.maxBy(eff(_, ratio)) else pairs.minBy(eff(_, ratio))
    }
  }

  /** Published headline + annotation: `(medianEff, bestPair, storm)`.
    * storm=true whenever fewer than `minPlausible` plausible pairs exist —
    * the callers' extra-draw loops exhaust their budget before accepting
    * this. When no pair is plausible the headline median falls back to the
    * best (least-implausible) pair's efficiency WITH the storm flag set, so
    * a reader can never mistake a degraded-window number for a measurement:
    * [0.361, 0.267, storm=false] is unrepresentable. */
  def select(pairs: Seq[PairStats], ratio: Double, thrFloor: Double,
      minPlausible: Int): (Double, PairStats, Boolean) = {
    val b = best(pairs, ratio, thrFloor)
    val m = median(pairs, ratio, thrFloor).getOrElse(eff(b, ratio))
    val storm = plausibleEffs(pairs, ratio, thrFloor).length < minPlausible
    (m, b, storm)
  }

  /** Should the caller draw another pair? True while the plausible count is
    * short of `minPlausible` OR (when `gateMedian` > 0) the plausible median
    * has not cleared the gate — extra samples move a median only if the
    * quiet-window reading is the typical one, so this cannot be won by one
    * lucky draw. */
  def needMore(pairs: Seq[PairStats], ratio: Double, thrFloor: Double,
      minPlausible: Int, gateMedian: Double): Boolean = {
    val m = median(pairs, ratio, thrFloor)
    m.isEmpty || plausibleEffs(pairs, ratio, thrFloor).length < minPlausible ||
      (gateMedian > 0 && m.get < gateMedian)
  }
}
