package graft.catalog

/** JVM-wide registry of write-time table statistics, fed by
  * [[Warehouse]] from `_graft_stats` manifests and read by optimizer
  * rules (graft.plans.RowNumberTopKRewrite) that need a cardinality
  * signal OSS Spark does not have for path-based tables (no catalog,
  * no ANALYZE). Keyed by the normalized table path, so any session in
  * the JVM reading the same warehouse path sees the same stats.
  */
object TableStatsRegistry {

  /** @param rows total data rows across files
    * @param ndv  per-column SUM of per-file approximate distinct
    *             counts — deliberately per-file-summed rather than
    *             global: the sum estimates the post-map-side-combine
    *             row count, which is exactly the signal a
    *             partial-aggregation rewrite needs (a key repeated
    *             only across files does not combine map-side either).
    */
  final case class TableStats(rows: Long, ndv: Map[String, Long])

  private val byPath =
    new java.util.concurrent.ConcurrentHashMap[String, TableStats]()
  private val attempted =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Scheme-insensitive key: `file:/tmp/x` and `/tmp/x` are one table. */
  def normalize(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  def put(path: String, stats: TableStats): Unit = {
    byPath.put(normalize(path), stats)
    ()
  }

  def get(path: String): Option[TableStats] = Option(byPath.get(normalize(path)))

  def invalidate(path: String): Unit = {
    val n = normalize(path)
    byPath.remove(n)
    attempted.remove(n)
    ()
  }

  /** True the first time a path is seen — lets readers lazy-load the
    * manifest at most once per JVM instead of on every read.
    */
  private[catalog] def shouldAttempt(path: String): Boolean =
    attempted.add(normalize(path))
}
