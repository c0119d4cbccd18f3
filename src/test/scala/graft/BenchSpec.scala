package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's budget-scheduling rule, pinned against the host windows
  * that motivated it (BASELINE.md round-4): a degraded window must yield
  * a COMPLETE two-level measurement with as much efficiency-signal
  * quality as the budget allows (corpus floor 160k before dropping
  * rounds, and only then the 40k hard floor), never a watchdog partial
  * with `"scaling": null`.
  */
class BenchSpec extends AnyFunSuite {

  test("healthy window keeps 320k files, both pairs, and the second warmup") {
    // measured healthy half-size warmup ≈ 16 s, ~900 s budget left
    val (files, rounds, warm2) = Bench.adaptSchedule(320000L, 16.0, 900.0, rounds0 = 2)
    assert(files == 320000L && rounds == 2)
    assert(warm2)
  }

  test("degraded window (the measured 26s-vs-233s episode) holds the 160k floor and drops to one pair") {
    // measured degraded half-size warmup ≈ 95 s, ~860 s budget left:
    // two 320k pairs ≈ 1700 s — impossible; two 160k pairs ≈ 1110 s —
    // still impossible; ONE 160k pair + reserve fits. Signal order:
    // corpus floor BEFORE round count, 80k/40k only as a last resort
    // (a clean 80k pair measures ≈0.37 efficiency where 320k reads 0.74
    // — sub-160k numbers are fixed-overhead noise)
    val (files, rounds, _) = Bench.adaptSchedule(320000L, 95.0, 860.0, rounds0 = 2)
    assert(files == 160000L, s"must hold the 160k floor, got $files")
    assert(rounds == 1)
    val estPair = 95.0 * 2 * 3.9 * 1.15 * (files.toDouble / 320000L)
    assert(rounds * estPair + 260.0 <= 860.0, s"files=$files estPair=$estPair")
  }

  test("catastrophic window floors at 40k with one pair instead of shrinking to nothing") {
    val (files, rounds, warm2) = Bench.adaptSchedule(320000L, 400.0, 500.0, rounds0 = 2)
    assert(files == 40000L && rounds == 1)
    assert(!warm2)
  }

  test("non-power-of-two start lands exactly on the floor") {
    val (files, _, _) = Bench.adaptSchedule(60000L, 400.0, 300.0, rounds0 = 2)
    assert(files == 40000L, s"got $files")
  }

  test("a scheduled pair that would eat the catalog reserve is dropped") {
    // the observed failure: warmup estimated ~224 s/pair, the real pair
    // cost 731 s (604 s low round in a steal episode) — at pair-2 time
    // only ~160 s remained and running it skipped all 54 catalog entries
    assert(!Bench.affordsPair(remainingSec = 160.0, lastPairSec = 731.0))
    // healthy window: pair ~170 s, plenty left → second pair runs
    assert(Bench.affordsPair(remainingSec = 700.0, lastPairSec = 170.0))
    // boundary: the reserve itself is never enough
    assert(!Bench.affordsPair(remainingSec = 260.0, lastPairSec = 0.1))
  }

  test("episode kill-switch: a round past 3x the level's banked best is aborted") {
    // the observed failure: best high 23.38 s, then a 135‰ episode round
    // ran 265.85 s and its trailing low + the whole catalog were skipped
    val threshold = Bench.abortAfterSec(Some(23.38))
    assert(threshold > 0 && 265.85 > threshold, s"threshold=$threshold")
    // a healthy repeat round is never near the threshold
    assert(25.0 < threshold)
    // small rounds: the +30 s floor absorbs JIT variance (an 8 s best
    // must not abort a 20 s second round)
    assert(20.0 < Bench.abortAfterSec(Some(8.0)))
    // no banked best at the level → never abort (a slow-but-clean host
    // is indistinguishable from an episode without a baseline)
    assert(Bench.abortAfterSec(None) == 0.0)
  }

  test("optional pair's low round is skipped when it would eat the catalog reserve") {
    // after the observed 265 s episode round ~200 s remained; last low
    // was 83 s — running it skipped all 54 catalog entries
    assert(!Bench.affordsLowRound(remainingSec = 200.0, lastLowSec = 83.0))
    // healthy fast window: plenty of room
    assert(Bench.affordsLowRound(remainingSec = 700.0, lastLowSec = 75.0))
    // the reserve alone is never enough
    assert(!Bench.affordsLowRound(remainingSec = 260.0, lastLowSec = 0.1))
  }

  test("kill-switch is scoped to its job group: a shared session's other work survives") {
    val spark = TestSpark.spark
    // a job that runs far longer than the 0.5 s threshold
    val res = Bench.withAbort(spark, 0.5) {
      spark.range(0, 1L << 35).selectExpr("sum(id % 7)").collect()
    }
    assert(res.isEmpty, "long round must be aborted")
    // the session is untouched: later jobs on it run normally
    assert(spark.range(10).count() == 10)
    // a generous threshold lets a quick round complete
    assert(Bench.withAbort(spark, 300.0) { spark.range(5).count() } == Some(5L))
    // unarmed (no banked best) never aborts
    assert(Bench.withAbort(spark, 0.0) { 42 } == Some(42))
    // a GENUINE failure past the deadline still propagates — only a
    // cancellation may read as an episode abort
    val boom = intercept[RuntimeException] {
      Bench.withAbort(spark, 0.2) { Thread.sleep(600); throw new RuntimeException("real bug") }
    }
    assert(boom.getMessage == "real bug")
  }

  test("launch gate: clean window requires low steal AND a healthy calMBs probe") {
    // clean: 0‰ steal, probe at the run's best and above the floor
    assert(Bench.gateClean(0, 1252.0, 1252.0))
    // visible steal episode (the 77‰ run that measured 0.07 efficiency)
    assert(!Bench.gateClean(77, 1200.0, 1200.0))
    // steal-INVISIBLE memory-bus episode: ≤5‰ steal but calMBs collapsed
    // (observed stamps 187/296/479 — all under the 600 floor)
    assert(!Bench.gateClean(2, 479.0, 479.0))
    assert(!Bench.gateClean(0, 187.0, 1300.0))
    // relative clause: probe 25% under the gate's own best is dirty even
    // above the absolute floor
    assert(!Bench.gateClean(0, 900.0, 1300.0))
    // slower-but-steady hardware below the floor never passes — the
    // bounded gate expires and the run proceeds (rule only gates START)
    assert(!Bench.gateClean(0, 500.0, 500.0))
    // boundary: exactly at 85% of best and at the floor is clean
    assert(Bench.gateClean(4, 1105.0, 1300.0))
  }
}
