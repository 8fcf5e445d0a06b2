package graft.util

/** Per-JVM observability counters for recall-affecting caps.
  *
  * Every banded/bucketed candidate generator in this engine bounds its
  * quadratic stage with a cap (`maxPostings`, `maxBucket`, …) and
  * documents the recall tradeoff in its scaladoc — but a documented cap
  * that fires SILENTLY is unobservable at scale: on 100 TB the
  * difference between "we dedup'd" and "we dropped every
  * boilerplate-heavy duplicate pair and can't tell" is exactly this
  * number. Operators therefore record how many keys each cap dropped
  * per invocation (last-run-wins, keyed by `<operator>.<cap>`), and log
  * the count at WARN when non-zero; callers at scale poll
  * [[snapshot]] after a run (or watch the log) before trusting the
  * output as "deduplicated".
  *
  * Driver-side only (the counts come from driver-executed aggregate
  * actions on already-thin histogram frames); thread-safe; `set`
  * overwrites so concurrent pipelines should read promptly or scope a
  * JVM per run, like [[PhaseTimer]].
  */
object CapCounters {
  private val buf = scala.collection.concurrent.TrieMap[String, Long]()
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Record the dropped-key count of one cap for the most recent
    * invocation; warns on data loss so unattended pipelines surface it.
    */
  def set(name: String, dropped: Long): Unit = {
    buf.put(name, dropped)
    if (dropped > 0)
      log.warn(
        s"cap $name dropped $dropped keys this run - recall is bounded; " +
          "inspect the operator's histogram before trusting dedup output")
  }

  def get(name: String): Option[Long] = buf.get(name)
  def snapshot: Map[String, Long] = buf.toMap
  def reset(): Unit = buf.clear()
}
