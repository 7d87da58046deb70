package graft

import org.scalatest.funsuite.AnyFunSuite

/** The probe-normalized SLOWER rule ([[Bench.slowerFlag]]): machine
  * drift alone must not flag, a real regression must still flag even on
  * a drifted machine, and on an idle machine the rule reduces to the
  * standard >20%-and->0.3s thresholds. */
class BenchFlagSpec extends AnyFunSuite {

  test("r13 false-positive pattern scores clean: key moved WITH a 1.43x drifted machine") {
    // the actual r13 wall-of-flags shape: stream_window_append 5.16->7.02s
    // under shuffle-probe drift 1.43x — pure contention, must not flag
    assert(!Bench.slowerFlag(secs = 7.02, prev = 5.16, drift = 1.43))
    // graph_louvain 5.73->8.71s at the same drift (1.52x raw, 1.06x normalized)
    assert(!Bench.slowerFlag(secs = 8.71, prev = 5.73, drift = 1.43))
  }

  test("planted real regression still flags through machine drift") {
    // a genuine 3x regression on a 1.43x-drifted machine
    assert(Bench.slowerFlag(secs = 6.0, prev = 2.0, drift = 1.43))
    // and a 2x regression on an idle machine
    assert(Bench.slowerFlag(secs = 4.0, prev = 2.0, drift = 1.0))
  }

  test("idle machine reduces to the raw thresholds") {
    assert(!Bench.slowerFlag(secs = 2.2, prev = 2.0, drift = 1.0))  // 10%, under 20%
    assert(!Bench.slowerFlag(secs = 0.45, prev = 0.2, drift = 1.0)) // big %, under 0.3s
    assert(Bench.slowerFlag(secs = 2.8, prev = 2.0, drift = 1.0))   // 40% and 0.8s
  }

  test("a FASTER machine never hides a regression (drift floored at 1)") {
    assert(Bench.slowerFlag(secs = 2.8, prev = 2.0, drift = 0.7))
  }
}
