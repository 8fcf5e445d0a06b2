package graft.util

import org.scalatest.funsuite.AnyFunSuite

class PhaseTimerSpec extends AnyFunSuite {

  test("nested phases record exclusive self-time; flat phases accumulate") {
    PhaseTimer.reset()
    PhaseTimer.time("outer") {
      Thread.sleep(30)
      PhaseTimer.time("inner") { Thread.sleep(60) }
      Thread.sleep(30)
    }
    val snap = PhaseTimer.snapshot
    // inner keeps its full 60ms; outer keeps only its ~60ms of self
    // time — the artifact's phases must PARTITION wall time, not
    // double-count every nesting level (a fixture building a
    // sub-fixture would otherwise report the sum twice)
    assert(snap("inner") >= 0.055 && snap("inner") < 0.5)
    assert(snap("outer") >= 0.055 && snap("outer") < 0.5,
      s"outer should exclude inner's time: $snap")
    // repeated phases accumulate
    PhaseTimer.time("outer")(Thread.sleep(20))
    assert(PhaseTimer.snapshot("outer") > snap("outer"))
    // add() stays a flat external credit (stream-thread durations)
    PhaseTimer.add("ext", 1.25)
    PhaseTimer.add("ext", 0.25)
    assert(math.abs(PhaseTimer.snapshot("ext") - 1.5) < 1e-9)
    PhaseTimer.reset()
    assert(PhaseTimer.snapshot.isEmpty)
  }
}
