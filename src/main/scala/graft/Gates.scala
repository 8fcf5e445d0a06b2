package graft

/** GATES.md generator — the gate-surface index the README's operator
  * table points into (round-16 verdict, next #8): every
  * [[SparkEntry.queries]] entry, its family (the queries object that
  * contributes it), and its oracle kind (DuckDB value hash vs
  * rows-only). Generated FROM the registry so it cannot drift:
  * `runMain graft.Gates` rewrites the file, and GatesSpec fails when
  * the committed file no longer matches the rendered registry.
  */
object Gates {

  private val families: Seq[(String, Set[String])] = Seq(
    "core" -> queries.CoreQueries.queries.keySet,
    "relational" -> queries.RelationalQueries.queries.keySet,
    "quality" -> queries.QualityQueries.queries.keySet,
    "text" -> queries.TextQueries.queries.keySet,
    "dedup" -> queries.DedupQueries.queries.keySet,
    "similarity" -> queries.SimQueries.queries.keySet,
    "multimodal" -> queries.MultimodalQueries.queries.keySet,
    "pipeline/warehouse" -> queries.PipelineQueries.queries.keySet,
    "analytic" -> queries.AnalyticQueries.queries.keySet,
    "streaming" -> queries.StreamingQueries.queries.keySet)

  private def familyOf(name: String): String =
    families.collectFirst { case (f, ks) if ks.contains(name) => f }
      .getOrElse("?")

  def render: String = {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val oracles = SparkEntry.oracleSql
    val header =
      s"""# Gate queries
         |
         |GENERATED — do not edit by hand; regenerate with
         |`runMain graft.Gates` (GatesSpec pins file == registry).
         |Every entry is runnable alone:
         |`runMain graft.Verify <sfDir> <outDir> <name>` then
         |`python3 tools/compare.py <sfDir> <outDir>`.
         |
         |${names.size} gate queries; ${names.count(oracles.contains)}
         |with a DuckDB value-hash oracle.
         |
         || gate | family | oracle |
         ||---|---|---|
         |""".stripMargin
    header + names.map { n =>
      val kind = if (oracles.contains(n)) "DuckDB hash" else "rows-only"
      s"| `$n` | ${familyOf(n)} | $kind |"
    }.mkString("", "\n", "\n")
  }

  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "GATES.md"
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      render.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    System.err.println(s"[gates] wrote $out (${SparkEntry.queries.size} gates)")
  }
}
