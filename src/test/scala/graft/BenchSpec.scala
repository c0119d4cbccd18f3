package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's budget-sizing rule, pinned against the two windows that
  * motivated it (BASELINE.md round-4): a degraded host window must yield
  * a COMPLETE smaller-size two-level measurement, never a watchdog
  * partial with `"scaling": null`; a healthy window keeps the full
  * corpus and the second JIT warmup.
  */
class BenchSpec extends AnyFunSuite {

  test("healthy window keeps 320k files and affords the second warmup") {
    // measured healthy half-size warmup ≈ 16 s, ~900 s budget left
    val (files, warm2) = Bench.adaptKgFiles(320000L, 16.0, 900.0, rounds = 2)
    assert(files == 320000L)
    assert(warm2)
  }

  test("degraded window (the measured 26s-vs-233s episode) downsizes and completes") {
    // measured degraded half-size warmup ≈ 95 s, ~860 s budget left:
    // full schedule would need 2×(95·2·3.9·1.15) ≈ 1700 s — impossible;
    // the rule must shrink until two pairs + the catalog reserve fit
    val (files, _) = Bench.adaptKgFiles(320000L, 95.0, 860.0, rounds = 2)
    assert(files < 320000L, s"must downsize, kept $files")
    // the chosen size actually fits: scaled pair estimate × rounds + reserve
    val estPair = 95.0 * 2 * 3.9 * 1.15 * (files.toDouble / 320000L)
    assert(2 * estPair + 260.0 <= 860.0, s"files=$files estPair=$estPair")
  }

  test("catastrophic window floors at 40k instead of shrinking to nothing") {
    val (files, warm2) = Bench.adaptKgFiles(320000L, 400.0, 500.0, rounds = 2)
    assert(files == 40000L)
    assert(!warm2)
  }
}
