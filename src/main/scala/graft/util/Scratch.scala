package graft.util

import org.apache.spark.sql.SparkSession

/** Per-JVM memoized gate fixtures.
  *
  * Gate queries are self-contained: each builds its own input fixture
  * (raw files in a scratch dir, a seeded warehouse, a synthesized media
  * corpus) before running the operator under test. The bench's WARM
  * pass re-invokes the same thunk, and without memoization it re-pays
  * the fixture build — which made warm numbers answer neither
  * "warm-up?" nor "plan cost?" for exactly the queries they were meant
  * to attribute (round-7 verdict, What's wrong #2).
  *
  * `once` builds a fixture the FIRST time a (session, sfDir, key)
  * triple is seen, timing the build under phase `<key>` (surfaced in
  * the bench artifact's `phases` map), and returns the memoized value
  * on every later call. The correctness gate (Verify) and the specs
  * invoke each query once per JVM+dir, so memoization is a plain
  * build there — semantics are unchanged.
  *
  * Keys include the SparkSession identity (specs may run several
  * sessions in one JVM; a fixture holding another session's
  * checkpointed data or Warehouse handle must not leak across) and the
  * sf dir (multi-SF specs run the same query at several scales).
  */
object Scratch {

  private val memo = scala.collection.concurrent.TrieMap[String, Any]()

  /** Build-once fixture: `build` runs on the first call per
    * (session, dir, key), timed under phase `key`; later calls return
    * the memoized value. Single-writer per key by construction (the
    * bench and Verify are sequential); TrieMap keeps concurrent specs
    * safe at worst building twice.
    */
  def once[T](spark: SparkSession, dir: String, key: String)(build: => T): T =
    memo.getOrElseUpdate(
      s"${System.identityHashCode(spark)}|$dir|$key",
      PhaseTimer.time(key)(build)).asInstanceOf[T]
}
