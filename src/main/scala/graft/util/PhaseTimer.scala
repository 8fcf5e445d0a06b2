package graft.util

/** Lightweight named-phase wall-clock accumulator for attributing the
  * cost of multi-action lifecycle operators (e.g. the checker lifecycle:
  * annotate → scorecard write → aggregate → merge). Driver-side only —
  * phases time driver-blocking actions, which is exactly the unit the
  * bench measures. Thread-safe; repeated phases accumulate.
  *
  * `time` records EXCLUSIVE self-time: a phase nested inside another
  * (a fixture's `Scratch.once` building a sub-fixture, a refresh
  * wrapping its mvagg.* internals) subtracts its children, so the
  * bench artifact's phase seconds PARTITION the queries' wall time
  * instead of double-counting every nesting level. Nesting is tracked
  * per thread (phases run on the driver thread). `add` stays a flat
  * external credit — it records durations Spark measured inside the
  * stream-execution thread, which this thread's stack cannot see.
  */
object PhaseTimer {
  private val buf = scala.collection.concurrent.TrieMap[String, Double]()
  private val stack =
    new ThreadLocal[java.util.ArrayDeque[Array[Double]]] {
      override def initialValue() = new java.util.ArrayDeque[Array[Double]]()
    }

  def time[T](name: String)(f: => T): T = {
    val st = stack.get()
    st.push(Array(0.0)) // child-seconds accumulator for this frame
    val t0 = System.nanoTime()
    try f
    finally {
      val total = (System.nanoTime() - t0) / 1e9
      val children = st.pop()(0)
      buf.updateWith(name) { prev =>
        Some(prev.getOrElse(0.0) + math.max(0.0, total - children))
      }
      if (!st.isEmpty) st.peek()(0) += total
    }
  }

  /** Accumulate an externally-measured duration (e.g. a streaming
    * query's per-batch `durationMs` breakdown, which Spark measures
    * inside the stream execution thread where `time` can't wrap).
    */
  def add(name: String, sec: Double): Unit =
    buf.updateWith(name) { prev => Some(prev.getOrElse(0.0) + sec) }

  def snapshot: Map[String, Double] = buf.toMap
  def reset(): Unit = buf.clear()
}
