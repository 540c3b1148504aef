package graft

import org.scalatest.funsuite.AnyFunSuite
import PairSelect._

/** Pure selection-policy tests (round-5 VERDICT #2): the published
  * (efficiency, storm_annotation) combinations must be honest by
  * construction — in particular the BENCH_r05 symmetric-storm reading
  * [0.361, 0.267, storm:false] must be unrepresentable. */
class PairSelectSpec extends AnyFunSuite {

  // a pair with the given efficiency (at ratio 4) and high-side throughput
  private def pair(e: Double, thrHigh: Double, steal: Double = 0.0): PairStats = {
    // thrLow such that thrHigh / (thrLow * 4) == e
    val thrLow = thrHigh / (4.0 * e)
    PairStats(secsLow = 100.0, itemsLow = (thrLow * 100.0).toLong, stealLow = steal,
      secsHigh = 25.0, itemsHigh = (thrHigh * 25.0).toLong, stealHigh = steal)
  }

  private def assertEff(p: PairStats, e: Double): Unit =
    assert(math.abs(eff(p, 4.0) - e) < 1e-3)

  test("eff computes thrHigh / (thrLow * ratio)") {
    assertEff(pair(0.85, 800000.0), 0.85)
    assertEff(pair(0.30, 470000.0), 0.30)
  }

  test("BENCH_r05 symmetric storm is unrepresentable as storm=false") {
    // the round-5 degraded window: effs 0.361/0.267, high side ~474k t/s,
    // zero steal — under the 545k floor both pairs are implausible
    val pairs = Seq(pair(0.361, 474089.0), pair(0.267, 440000.0))
    val floor = 545000.0
    assert(plausibleEffs(pairs, 4.0, floor).isEmpty)
    assert(needMore(pairs, 4.0, floor, minPlausible = 2, gateMedian = 0.0))
    val (m, _, storm) = select(pairs, 4.0, floor, minPlausible = 2)
    assert(storm, "a degraded-window pair set MUST carry the storm flag")
    // fallback headline is the least-degraded pair, explicitly storm-flagged
    assert(math.abs(m - 0.361) < 1e-3)
  }

  test("quiet-window pairs above the floor publish without annotation") {
    val pairs = Seq(pair(0.88, 850000.0), pair(0.91, 870000.0))
    val floor = 545000.0
    assert(plausibleEffs(pairs, 4.0, floor).length == 2)
    assert(!needMore(pairs, 4.0, floor, minPlausible = 2, gateMedian = 0.0))
    val (m, b, storm) = select(pairs, 4.0, floor, minPlausible = 2)
    assert(!storm)
    assert(math.abs(m - 0.88) < 1e-3) // lower median of two
    assert(math.abs(eff(b, 4.0) - 0.91) < 1e-3) // best pair
  }

  test("superlinear pairs (low-side-only storm) are excluded") {
    val pairs = Seq(pair(1.35, 900000.0), pair(0.86, 820000.0))
    val p = plausibleEffs(pairs, 4.0, 545000.0)
    assert(p == Seq(0.86).map(e => eff(pair(e, 820000.0), 4.0)) ||
      (p.length == 1 && math.abs(p.head - 0.86) < 1e-3))
  }

  test("all-superlinear draw set keeps drawing (round-5 ADVICE) and falls back least-inflated") {
    val pairs = Seq(pair(1.40, 900000.0), pair(1.15, 880000.0))
    assert(needMore(pairs, 4.0, 545000.0, minPlausible = 1, gateMedian = 0.80),
      "no plausible pair -> must keep drawing while budget lasts")
    val (m, b, storm) = select(pairs, 4.0, 545000.0, minPlausible = 1)
    assert(storm)
    assert(math.abs(eff(b, 4.0) - 1.15) < 1e-3, "least-inflated fallback, not maxBy")
    assert(math.abs(m - 1.15) < 1e-3)
  }

  test("median gate drives extra draws until typical reading clears it") {
    val below = Seq(pair(0.70, 800000.0), pair(0.72, 810000.0), pair(0.90, 820000.0))
    assert(needMore(below, 4.0, 545000.0, minPlausible = 1, gateMedian = 0.80))
    val above = below :+ pair(0.88, 830000.0) :+ pair(0.92, 840000.0)
    // sorted plausible effs: 0.70 0.72 0.88 0.90 0.92 -> median 0.88
    assert(!needMore(above, 4.0, 545000.0, minPlausible = 1, gateMedian = 0.80))
    val (m, _, storm) = select(above, 4.0, 545000.0, minPlausible = 1)
    assert(!storm && math.abs(m - 0.88) < 1e-3)
  }

  test("floor 0 disables the absolute check (non-default run shapes)") {
    val pairs = Seq(pair(0.85, 50000.0))
    assert(plausible(pairs.head, 4.0, 0.0))
    assert(!plausible(pairs.head, 4.0, 545000.0))
  }

  test("ClusterSessions qualification and field injection") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def q(json: String): Boolean = ClusterSessions.qualified(mapper.readTree(json))
    val good = """{"pairs":4,"storm_annotation":false,"steal_frac_max":0.001,
      "probe_thr_local32":810000.0,"probe_pages":4000000,"probe_cpus":32,
      "scaling_efficiency":0.87}"""
    assert(q(good))
    assert(!q(good.replace("\"pairs\":4", "\"pairs\":3")))
    assert(!q(good.replace("false", "true")))
    assert(!q(good.replace("0.001", "0.05")))
    assert(!q(good.replace("810000.0", "500000.0")))
    // the band check is only valid at the band's own probe shape (round-6
    // ADVICE: a non-default-shape live run must not be judged against a
    // band measured on a different workload)
    assert(!q(good.replace("4000000", "2000000")))
    assert(!q(good.replace("\"probe_cpus\":32", "\"probe_cpus\":16")))
    // missing shape fields disqualify (conservative)
    assert(!q("""{"pairs":4,"storm_annotation":false,"steal_frac_max":0.001,
      "probe_thr_local32":810000.0,"scaling_efficiency":0.87}"""))
    val injected = ClusterSessions.withFields("""{"a":1}""", "\"b\":2")
    assert(injected == """{"a":1,"b":2}""")
  }

  test("ClusterSessions.choose publishes the MEDIAN qualified session, max as auxiliary") {
    def sess(eff: Double, pairs: Int = 5, storm: Boolean = false,
        probe: Double = 820000.0): String =
      s"""{"pairs":$pairs,"storm_annotation":$storm,"steal_frac_max":0.001,""" +
        s""""probe_thr_local32":$probe,"probe_pages":4000000,"probe_cpus":32,""" +
        s""""scaling_efficiency":$eff}"""
    val dir = java.nio.file.Files.createTempDirectory("css-test")
    val file = dir.resolve("sessions.jsonl").toString
    // no file at all -> live wins even if unqualified
    val liveBad = """{"pairs":4,"storm_annotation":false,"steal_frac_max":0.001,
      "scaling_efficiency":0.30}""" // live probe + shape injected by choose()
    locally {
      val (chosen, liveAudit, n) =
        ClusterSessions.choose(liveBad, 400000.0, 4000000L, 32, file)
      assert(liveAudit.isEmpty && n == 1)
      assert(chosen.contains("\"session\":\"live\""))
    }
    // recorded: one qualified (0.84), one better-but-stormy, one garbage line
    ClusterSessions.record(sess(0.84), file)
    ClusterSessions.record(sess(0.95, storm = true), file)
    ClusterSessions.record("not json", file)
    locally {
      val (chosen, liveAudit, n) =
        ClusterSessions.choose(liveBad, 400000.0, 4000000L, 32, file)
      assert(n == 3, "2 parseable recorded + live")
      assert(chosen.contains("\"scaling_efficiency\":0.84"), s"got $chosen")
      assert(chosen.contains("\"sessions_qualified\":1"), s"got $chosen")
      assert(liveAudit.exists(_.contains("\"session\":\"live\"")),
        "live measurement must ship for audit when a recorded session wins")
    }
    // three qualified sessions -> the MEDIAN one (0.86) is the headline,
    // NOT the max (0.93): max-of-qualified is best-case window selection
    // (round-6 VERDICT #3). The max ships inside the chosen object.
    ClusterSessions.record(sess(0.93), file)
    ClusterSessions.record(sess(0.86), file)
    locally {
      val (chosen, _, _) =
        ClusterSessions.choose(liveBad, 400000.0, 4000000L, 32, file)
      assert(chosen.contains("\"scaling_efficiency\":0.86"), s"got $chosen")
      assert(chosen.contains("\"sessions_qualified\":3"), s"got $chosen")
      assert(chosen.contains("\"scaling_efficiency_best_session\":0.930"), s"got $chosen")
    }
    // even qualified count -> lower-middle (conservative): {0.84,0.86,0.90,
    // 0.93} -> 0.86. The qualified live candidate competes like any session.
    val liveGood = """{"pairs":4,"storm_annotation":false,"steal_frac_max":0.001,
      "scaling_efficiency":0.90}"""
    locally {
      val (chosen, _, _) =
        ClusterSessions.choose(liveGood, 820000.0, 4000000L, 32, file)
      assert(chosen.contains("\"scaling_efficiency\":0.86"), s"got $chosen")
      assert(chosen.contains("\"sessions_qualified\":4"), s"got $chosen")
    }
    // a live run at a NON-band shape is never band-qualified: recorded wins
    locally {
      val (chosen, liveAudit, _) =
        ClusterSessions.choose(liveGood, 820000.0, 2000000L, 32, file)
      assert(!chosen.contains("\"session\":\"live\""))
      assert(liveAudit.nonEmpty)
    }
    Bench.rmTree(dir.toFile)
  }
}
