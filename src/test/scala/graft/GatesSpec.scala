package graft

import org.scalatest.funsuite.AnyFunSuite

/** GATES.md stays in sync with the registry: the committed file must
  * equal the rendered output of [[Gates.render]] — a gate added
  * without `runMain graft.Gates` fails here, which is what keeps the
  * index from going stale the way the README's hand-written count did.
  */
class GatesSpec extends AnyFunSuite {

  test("GATES.md matches the query registry (regenerate with runMain graft.Gates)") {
    val committed = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("GATES.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(committed == Gates.render,
      "GATES.md is stale — run `runMain graft.Gates` and commit the result")
  }

  test("every gate has a family and every oracle key has a gate") {
    val names = SparkEntry.queries.keySet
    val orphanOracles = SparkEntry.oracleSql.keySet -- names
    assert(orphanOracles.isEmpty,
      s"oracleSql entries without a gate: ${orphanOracles.mkString(", ")}")
    assert(!Gates.render.contains("| ? |"),
      "a gate resolved to no family — register its queries object in Gates")
  }
}
