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

  // --- contended-run flag suppression (r14 adjudication mechanized) ---

  test("contended run emits zero per-key flags, one marker line") {
    // the r14 artifact shape: 1.98x shuffle drift, graph_bfs 3.63->131.7s
    // (barrier amplification — normalization cannot absorb it)
    val prev = Map("graph_bfs" -> 3.63, "graph_eigenvector" -> 5.31, "agg_mode" -> 1.0)
    val timed = Seq("graph_bfs" -> 131.7, "graph_eigenvector" -> 12.0, "agg_mode" -> 1.1)
    val lines = Bench.diffLines(prev, timed, driftFactor = 1.98, streamDrift = 1.98)
    assert(lines.size == 1)
    assert(lines.head.contains("CONTENDED RUN"))
    assert(!lines.exists(_.contains("->"))) // no per-key "prev -> now" flag rows
    assert(Bench.contendedRun(1.98, 1.98))
  }

  test("stream-only probe drift also counts as contended (history guard)") {
    // cpu/shuffle probes idle but the streaming trigger probe drifted:
    // history must not be rewritten and stream flags must be suppressed
    assert(Bench.contendedRun(driftFactor = 1.0, streamDrift = 1.6))
    val lines = Bench.diffLines(Map("stream_window_append" -> 5.16),
      Seq("stream_window_append" -> 8.5), driftFactor = 1.0, streamDrift = 1.6)
    assert(lines.size == 1 && lines.head.contains("CONTENDED RUN"))
  }

  test("history guard: stream probe held to its tighter 1.10x bound (r16 driver shape)") {
    // the r16 driver run: cpu/shuffle probes clean, stream probe 1.17x —
    // it passed the shared 1.25x guard and rewrote the stream family's
    // history +36s. The rewrite guard must refuse that run...
    assert(Bench.historyGuardExceeded(driftFactor = 1.02, streamRatio = 1.17))
    // ...while per-key flag suppression keeps the looser bound (verdicts
    // on such a run are still probe-normalized per key)
    assert(!Bench.contendedRun(driftFactor = 1.02, streamDrift = 1.17))
    // an idle run passes both
    assert(!Bench.historyGuardExceeded(driftFactor = 1.05, streamRatio = 1.05))
    // cpu/shuffle drift alone still trips the rewrite guard at 1.25x
    assert(Bench.historyGuardExceeded(driftFactor = 1.3, streamRatio = 1.0))
    assert(!Bench.historyGuardExceeded(driftFactor = 1.2, streamRatio = 1.0))
    // the guard takes the RAW stream ratio, not the cpu-floored flag
    // normalizer: a clean stream probe (0.92x) on a 1.11x-cpu run (the
    // r17 measure-first shape) answers to the cpu bound alone
    assert(!Bench.historyGuardExceeded(driftFactor = 1.11, streamRatio = 0.92))
  }

  test("planted regression on a clean run still flags per-key") {
    val prev = Map("graph_bfs" -> 3.63, "agg_mode" -> 1.0)
    val timed = Seq("graph_bfs" -> 9.0, "agg_mode" -> 1.05)
    val lines = Bench.diffLines(prev, timed, driftFactor = 1.1, streamDrift = 1.1)
    assert(!Bench.contendedRun(1.1, 1.1))
    assert(lines.exists(l => l.contains("graph_bfs") && l.contains("SLOWER")))
    assert(!lines.exists(_.contains("agg_mode")))
    assert(!lines.exists(_.contains("CONTENDED")))
  }

  test("clean quiet run with no movement reports the all-clear line") {
    val lines = Bench.diffLines(Map("agg_mode" -> 1.0), Seq("agg_mode" -> 1.02),
      driftFactor = 1.0, streamDrift = 1.0)
    assert(lines == Seq("no query moved beyond drift-normalized 20% and 0.3s"))
  }

  test("per-key normalizer: stream keys answer to the stream probe, others to cpu/shuffle") {
    assert(Bench.keyDrift("stream_window_append", 1.0, 1.2) == 1.2)
    assert(Bench.keyDrift("graph_bfs", 1.1, 1.2) == 1.1)
    // a stream key that moved WITH a 1.2x trigger drift scores clean even
    // though the generic normalizer alone would flag it
    val lines = Bench.diffLines(Map("stream_window_append" -> 5.0),
      Seq("stream_window_append" -> 5.9), driftFactor = 1.0, streamDrift = 1.2)
    assert(lines == Seq("no query moved beyond drift-normalized 20% and 0.3s"))
  }
}
