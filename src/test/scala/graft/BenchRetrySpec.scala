package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's warm-outlier confirmation pass (round-20 verdict, next
  * #3) — pure decision logic, unit-tested so the contention hardening
  * cannot silently regress: retry on warm-over-cold inversions and on
  * any warm above the heavy threshold; never on a warm that confirms
  * its cold.
  */
class BenchRetrySpec extends AnyFunSuite {

  test("warm-over-cold inversion retries (both ratio and absolute gap required)") {
    assert(Bench.warmNeedsRetry(cold = 2.0, warm = 3.5)) // 1.75x, +1.5s
    assert(!Bench.warmNeedsRetry(cold = 2.0, warm = 2.4)) // 1.2x: ratio too small
    assert(!Bench.warmNeedsRetry(cold = 0.5, warm = 1.2)) // +0.7s: gap too small
    assert(Bench.warmNeedsRetry(cold = 1.0, warm = 2.1)) // 2.1x, +1.1s
  }

  test("heavy warm entries always get a confirmation pass") {
    assert(Bench.warmNeedsRetry(cold = 10.0, warm = 5.1)) // > 5s, even sub-cold
    assert(Bench.warmNeedsRetry(cold = 6.0, warm = 6.0))
    assert(!Bench.warmNeedsRetry(cold = 6.0, warm = 4.9)) // fast confirm: done
  }

  test("a warm that confirms its cold is not retried") {
    assert(!Bench.warmNeedsRetry(cold = 3.0, warm = 2.8))
    assert(!Bench.warmNeedsRetry(cold = 2.5, warm = 2.5))
  }
}
