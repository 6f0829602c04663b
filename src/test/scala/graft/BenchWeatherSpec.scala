package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench artifact's weather classification (round 16): the label
  * exists so a cross-round BENCH_r{N}.json diff can never misread storm
  * inflation as regression (BENCH_r15's 172.8 s headline needed a human to
  * decode warmup_sec=375). The thresholds are the calm-hunt bar (46 s,
  * provenance in the CalmWarmupBar scaladoc) and 2x it — moving either is
  * a deliberate recalibration, not a refactor side-effect.
  */
class BenchWeatherSpec extends AnyFunSuite {

  test("boundaries: calm <= bar < moderate <= 2x bar < heavy") {
    assert(Bench.CalmWarmupBar === 46.0)
    assert(Bench.weatherLabel(30.0, fullWarmupRan = true) === "calm")
    assert(Bench.weatherLabel(46.0, fullWarmupRan = true) === "calm")
    assert(Bench.weatherLabel(46.01, fullWarmupRan = true) === "moderate")
    assert(Bench.weatherLabel(92.0, fullWarmupRan = true) === "moderate")
    assert(Bench.weatherLabel(92.01, fullWarmupRan = true) === "heavy")
    assert(Bench.weatherLabel(375.0, fullWarmupRan = true) === "heavy")
  }

  test("a skipped registry warm pass voids the bar's precondition") {
    // warmup_sec then measures different (much smaller) work, so even a
    // tiny value must not be labeled calm
    assert(Bench.weatherLabel(5.0, fullWarmupRan = false) === "unknown")
    assert(Bench.weatherLabel(500.0, fullWarmupRan = false) === "unknown")
  }
}
