package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench artifact's gust-attribution semantics (round 17, VERDICT
  * r16 ask 2). The entry-weather label is a floor — a mid-suite host gust
  * under a calm warmup reads "calm" while inflating whichever adjacent
  * gates were in flight (proven live twice: the r15 asof pair, the r16
  * dedup quartet, both 10-40x their back-to-back siblings). gust_suspect
  * mechanizes the prescribed "re-run back-to-back" diagnostic: gates
  * strictly above GustAbsFloorSec in the timed loop are re-run once after
  * it, and flagged when the timed wall is >= GustRatio x the re-run.
  * Moving either threshold is a deliberate recalibration, not a refactor
  * side-effect.
  */
class BenchGustSpec extends AnyFunSuite {

  test("candidate floor: strictly above 5 s, order preserved") {
    assert(Bench.GustAbsFloorSec === 5.0)
    val timed = Seq("a" -> 0.4, "b" -> 5.0, "c" -> 5.01, "d" -> 41.0)
    // 5.0 exactly is NOT a candidate (a calm-band slow gate must not earn
    // a re-run); anything strictly above is
    assert(Bench.gustCandidates(timed) === Seq("c", "d"))
    assert(Bench.gustCandidates(Seq("x" -> 4.99)) === Seq.empty)
  }

  test("suspect ratio: timed >= 10x the back-to-back re-run") {
    assert(Bench.GustRatio === 10.0)
    // the r16 live event's shape: 16-41 s timed vs 1-2 s sibling → flagged
    assert(Bench.isGustSuspect(timedSec = 16.0, rerunSec = 1.6))
    assert(Bench.isGustSuspect(timedSec = 41.0, rerunSec = 2.0))
    // exactly 10x flags; just under does not (legitimate warm-vs-warm
    // jitter measured within ~3x)
    assert(Bench.isGustSuspect(timedSec = 20.0, rerunSec = 2.0))
    assert(!Bench.isGustSuspect(timedSec = 19.99, rerunSec = 2.0))
    // a legitimately-slow gate that re-runs slow is NOT a gust
    assert(!Bench.isGustSuspect(timedSec = 7.4, rerunSec = 6.8))
  }

  test("a near-zero re-run cannot divide to infinity and still flags") {
    // strongest gust evidence there is: 6 s timed, ~0 s re-run
    assert(Bench.isGustSuspect(timedSec = 6.0, rerunSec = 0.0))
    // but the timed wall must itself clear the candidate floor — a fast
    // gate can never be a suspect regardless of ratio
    assert(!Bench.isGustSuspect(timedSec = 4.0, rerunSec = 0.0))
    assert(!Bench.isGustSuspect(timedSec = 5.0, rerunSec = 0.1))
  }

  test("a FAILED re-run (marker -1) is never a suspect") {
    // ADVICE r17: a gate that crashes quickly on re-run must not read as
    // the strongest gust evidence there is — the marker excludes it
    assert(Bench.GustRerunFailed === -1.0)
    assert(!Bench.isGustSuspect(timedSec = 20.0, rerunSec = Bench.GustRerunFailed))
  }

  test("gust-corrected composite: min(timed, rerun) over candidates only") {
    val timed = Seq("a" -> 0.4, "b" -> 41.0, "c" -> 7.0, "d" -> 2.0)
    // b gusted (1.6 s sibling), c legitimately slow but faster warm (3.2),
    // a/d under the floor (no re-run exists)
    val rerun = Map("b" -> 1.6, "c" -> 3.2)
    assert(Bench.gustCorrectedTotal(timed, rerun) === 0.4 + 1.6 + 3.2 + 2.0)
    // a re-run SLOWER than the timed wall never inflates the composite
    assert(Bench.gustCorrectedTotal(Seq("x" -> 6.0), Map("x" -> 9.0)) === 6.0)
    // a failed re-run falls back to the timed wall, not to -1
    assert(Bench.gustCorrectedTotal(
      Seq("x" -> 6.0), Map("x" -> Bench.GustRerunFailed)) === 6.0)
    // no re-runs at all: composite == raw total
    assert(Bench.gustCorrectedTotal(timed, Map.empty) === timed.map(_._2).sum)
  }
}
