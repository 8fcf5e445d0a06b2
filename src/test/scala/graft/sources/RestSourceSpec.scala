package graft.sources

import java.time.Instant

import graft.SparkSpec
import graft.catalog.{TableRef, Warehouse}
import graft.ingest.{IngestSpec, Ingestor}

class RestSourceSpec extends SparkSpec {

  private val fixedNow = Instant.parse("2026-08-12T10:00:00Z")

  private def fakeTransport(body: String): RestEndpoint => String = { ep =>
    assert(ep.baseUrl == "https://api.example.test" && ep.endpoint == "quote/list")
    body
  }

  private val ep = RestEndpoint("https://api.example.test", "quote/list",
    Map("Authorization" -> "Bearer t"), "stock")

  test("array payload lands as JSON lines with loaded_at and asset_type stamped") {
    val src = new RestSource(fakeTransport(
      """[{"sym": "AAAA3", "px": "10.5"}, {"sym": "BBBB4", "px": "61.0"}]"""),
      () => fixedNow)
    val rawRoot = tmpDir("rest-raw")
    val file = src.land(ep, rawRoot, "brapi", "quotes")
    val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(file))
    assert(lines.size() === 2)
    assert(lines.get(0).contains(""""loaded_at": "2026-08-12T10:00:00Z""""))
    assert(lines.get(0).contains(""""asset_type": "stock""""))
    assert(lines.get(0).contains(""""sym": "AAAA3""""))
  }

  test("nested arrays/strings with commas survive top-level splitting") {
    val src = new RestSource(fakeTransport(
      """[{"a": [1, 2], "b": "x, y"}, {"a": [], "b": "{not, json}"}]"""),
      () => fixedNow)
    val parts = src.splitTopLevel("""[{"a": [1, 2], "b": "x, y"}, {"a": [], "b": "{not, json}"}]""")
    assert(parts.size === 2)
    assert(parts(0) === """{"a": [1, 2], "b": "x, y"}""")
  }

  test("landed raw zone feeds the schema-enforced S1 ingestion end-to-end") {
    val src = new RestSource(fakeTransport(
      """[{"sym": "AAAA3", "px": "10.5"}, {"sym": "BBBB4", "px": "61.0"}]"""),
      () => fixedNow)
    val base = tmpDir("rest-e2e")
    src.land(ep, s"$base/raw", "brapi", "quotes")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$base/meta/bronze/quotes"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$base/meta/bronze/quotes/quotes.yml"),
      """schema:
        |  - name: 'sym'
        |    type: 'string'
        |    key: true
        |  - name: 'px'
        |    type: 'string'
        |  - name: 'asset_type'
        |    type: 'string'
        |""".stripMargin)
    val wh = new Warehouse(spark, s"$base/warehouse")
    new Ingestor(spark, wh, IngestSpec(
      TableRef("bronze", "brapi", "quotes"), "json", s"$base/raw", s"$base/meta/bronze")).run()
    import spark.implicits._
    val rows = wh.read(TableRef("bronze", "brapi", "quotes"))
      .selectExpr("sym", "px", "asset_type")
      .as[(String, String, String)].collect().sortBy(_._1).toSeq
    assert(rows === Seq(("AAAA3", "10.5", "stock"), ("BBBB4", "61.0", "stock")))
  }
}
