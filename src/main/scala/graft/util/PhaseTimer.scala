package graft.util

/** Lightweight named-phase wall-clock accumulator for attributing the
  * cost of multi-action lifecycle operators (e.g. the checker lifecycle:
  * annotate → scorecard write → aggregate → merge). Driver-side only —
  * phases time driver-blocking actions, which is exactly the unit the
  * bench measures. Thread-safe; repeated phases accumulate.
  */
object PhaseTimer {
  private val buf = scala.collection.concurrent.TrieMap[String, Double]()

  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    val sec = (System.nanoTime() - t0) / 1e9
    buf.updateWith(name) { prev => Some(prev.getOrElse(0.0) + sec) }
    r
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
