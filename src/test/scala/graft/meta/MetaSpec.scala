package graft.meta

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Fixtures mirror the reference YAML *shapes* (FIXTURES.md §1) with
  * our own table content.
  */
class MetaSpec extends AnyFunSuite {

  val flatYaml: String =
    """schema:
      |  - name: 'item'
      |    type: 'string'
      |    nullable: false
      |    key: true
      |
      |  - name: 'price'
      |    type: 'string'
      |    nullable: false
      |
      |  - name: 'loaded_at'
      |    type: 'string'
      |    nullable: false
      |    date_predicate: true
      |""".stripMargin

  val nestedYaml: String =
    """schema:
      |  - name: 'sym'
      |    type: 'string'
      |    nullable: false
      |    key: true
      |  - name: 'history'
      |    type: 'array'
      |    nullable: false
      |    element_type:
      |      type: 'struct'
      |      fields:
      |        - name: 'day'
      |          type: 'string'
      |        - name: 'px'
      |          type: 'string'
      |  - name: 'tags'
      |    type: 'array'
      |    nullable: true
      |  - name: 'profile'
      |    type: 'struct'
      |    nullable: false
      |    fields:
      |      - name: 'city'
      |        type: 'string'
      |      - name: 'officers'
      |        type: 'array'
      |  - name: 'seen_at'
      |    type: 'timestamp'
      |    nullable: false
      |    date_predicate: true
      |""".stripMargin

  val testsYaml: String =
    """schema:
      |  - name: 'sym'
      |    type: 'string'
      |    nullable: false
      |    mandate: 'global_required'
      |    key: true
      |    tests:
      |      - test_type: missing
      |      - test_type: duplicated
      |      - test_type: type_mismatch
      |  - name: 'day'
      |    type: 'string'
      |    mandate: 'global_required'
      |    date_predicate: true
      |    key: true
      |    tests:
      |      - test_type: outdated
      |        kwargs:
      |          threshold: 15
      |  - name: 'px'
      |    type: 'string'
      |    mandate: 'local_optional'
      |    tests:
      |      - test_type: outside_of_rules
      |        test_name: px too low (<10000)
      |        kwargs:
      |          expression: px < 10000
      |""".stripMargin

  val jobsYaml: String =
    """jobs:
      |  - name: 'bronze_full'
      |    type: 'full'
      |    tables:
      |    - table_name: 'a'
      |      input_format: 'json'
      |      catalog: 'bronze'
      |      schema: 'demo'
      |
      |    - table_name: 'b'
      |      input_format: 'parquet'
      |      catalog: 'bronze'
      |      schema: 'demo'
      |
      |  - name: 'silver_cdc'
      |    type: 'cdc'
      |    tables:
      |      - table_name: 'c'
      |        input_format: 'delta'
      |        catalog: 'silver'
      |        schema: 'demo'
      |""".stripMargin

  test("flat schema parses with key and ts discovery") {
    val m = TableMeta.fromYamlString(flatYaml)
    assert(m.schema === StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("price", StringType, nullable = false),
      StructField("loaded_at", StringType, nullable = false))))
    assert(m.idField === "item")
    assert(m.tsField === "loaded_at")
  }

  test("nested struct/array types parse recursively") {
    val m = TableMeta.fromYamlString(nestedYaml)
    val hist = m.schema("history").dataType
    assert(hist === ArrayType(StructType(Seq(
      StructField("day", StringType),
      StructField("px", StringType)))))
    // array without element_type defaults to string (lib/ingestors.py:50-56)
    assert(m.schema("tags").dataType === ArrayType(StringType))
    val prof = m.schema("profile").dataType.asInstanceOf[StructType]
    assert(prof("officers").dataType === ArrayType(StringType))
    assert(m.schema("seen_at").dataType === TimestampType)
  }

  test("tests flatten with kwargs, mandate, composite keys") {
    val m = TableMeta.fromYamlString(testsYaml)
    assert(m.keyColumns === Seq("sym", "day"))
    assert(m.idField === "sym") // first key wins (lib/ingestors.py:37)
    val tests = m.columnTests
    assert(tests.map(_._2.testType) ===
      Seq("missing", "duplicated", "type_mismatch", "outdated", "outside_of_rules"))
    val outdated = tests.find(_._2.testType == "outdated").get._2
    assert(outdated.kwargs === Map("threshold" -> "15"))
    val rule = tests.find(_._2.testType == "outside_of_rules").get._2
    assert(rule.testName === "px too low (<10000)")
    assert(rule.kwargs("expression") === "px < 10000")
    assert(tests.find(_._2.testType == "missing").get._1.mandate === Some("global_required"))
  }

  test("job registry finds by type and name, errors otherwise") {
    val r = JobRegistry.fromYamlString(jobsYaml)
    val full = r.find("full", "bronze_full")
    assert(full.tables.map(_.tableName) === Seq("a", "b"))
    assert(full.tables.head.inputFormat === "json")
    val cdc = r.find("cdc", "silver_cdc")
    assert(cdc.tables.head.catalog === "silver")
    intercept[NoSuchElementException] { r.find("full", "silver_cdc") }
  }

  test("unknown scalar type fails loudly") {
    val bad = "schema:\n  - name: 'x'\n    type: 'decimalish'\n"
    intercept[IllegalArgumentException] { TableMeta.fromYamlString(bad) }
  }

  test("yaml parser handles comments, blank lines, same-indent lists") {
    val v = Yaml.parse(
      """# comment
        |top:
        |  child: 'quoted value'
        |  flag: true
        |
        |  items:
        |  - k: 1
        |  - k: 2
        |""".stripMargin)
    assert(v.get("top").flatMap(_.str("child")) === Some("quoted value"))
    assert(v.get("top").exists(_.bool("flag")))
    assert(v.get("top").map(_.list("items").flatMap(_.str("k"))) === Some(Seq("1", "2")))
  }
}
