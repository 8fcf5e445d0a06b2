package graft.quality

import java.time.LocalDate

import graft.SparkSpec
import graft.meta.TableMeta

class CheckerSpec extends SparkSpec {

  private val runDate = LocalDate.of(2026, 8, 12)

  // prices-shaped metadata (FIXTURES.md §1.3) with every test type
  private val yaml =
    """schema:
      |  - name: 'symbol'
      |    type: 'string'
      |    nullable: false
      |    mandate: 'global_required'
      |    key: true
      |    tests:
      |      - test_type: missing
      |      - test_type: duplicated
      |      - test_type: pattern_mismatch
      |        test_name: 'ticker shape'
      |        kwargs:
      |          pattern: '^[A-Z]{4}[0-9]$'
      |  - name: 'date'
      |    type: 'date'
      |    nullable: false
      |    mandate: 'global_required'
      |    key: true
      |    date_predicate: true
      |    tests:
      |      - test_type: outdated
      |        kwargs:
      |          threshold: 15
      |  - name: 'high'
      |    type: 'double'
      |    mandate: 'global_required'
      |    tests:
      |      - test_type: type_mismatch
      |      - test_type: outside_of_rules
      |        test_name: 'high < low'
      |        kwargs:
      |          expression: high < low
      |  - name: 'low'
      |    type: 'double'
      |    mandate: 'global_required'
      |  - name: 'status'
      |    type: 'string'
      |    mandate: 'local_optional'
      |    tests:
      |      - test_type: not_in_list
      |        kwargs:
      |          expected_values:
      |            - 'Open'
      |            - 'Closed'
      |""".stripMargin

  private def fixture = {
    import spark.implicits._
    // (symbol, date, high, low, status) — all strings, so cast paths are
    // live. outside_of_rules semantics (checker.py:207): the expression
    // is the condition a row MUST satisfy; NOT satisfying it (or null)
    // fails — so with expression `high < low`, high>=low rows FAIL.
    // NOTE comparisons in the rule run on STRINGS (the columns are
    // strings, as in bronze): '10.0' < '5.0' is lexicographic and TRUE
    Seq(
      ("AAAA3", "2099-01-01", "10.0", "5.0", "open"),  // rules: '10.0'<'5.0' lexically true → passed
      ("",      "2099-01-02", "oops", "5.0", "OPEN "), // missing symbol; type_mismatch high; rules 'oops'<'5.0' false → failed
      ("AAAA3", "2000-01-01", "3.0", "9.0", "weird"),  // duplicated symbol; outdated; rules true → passed; not_in_list failed
      ("BBBB4", "2099-01-03", null,  "1.0", null)      // null high → rules failed (isNull); null status → isin(null) is null → passed (reference quirk)
    ).toDF("symbol", "date", "high", "low", "status")
  }

  private def meta = TableMeta.fromYamlString(yaml)

  test("annotate: per-test verdicts match reference semantics") {
    import spark.implicits._
    val out = new Checker(fixture, meta, runDate).annotate()
    assert(out.columns.toSeq === Checker.resultColumns)
    // row count = rows × tests
    assert(out.count() === 4 * 7)

    def verdicts(testType: String, testName: String = ""): Map[String, String] =
      out.filter($"test_type" === testType && $"test_name" === testName)
        .select("df_key", "check_result").as[(String, String)]
        .collect().toMap

    val missing = verdicts("missing")
    assert(missing("AAAA3_2099-01-01") === "passed")
    assert(missing("_2099-01-02") === "failed") // empty-string sentinel

    val dup = verdicts("duplicated")
    // AAAA3 appears twice: first by df_key order passes, second fails
    assert(dup("AAAA3_2000-01-01") === "passed") // sorts before 2099 key
    assert(dup("AAAA3_2099-01-01") === "failed")
    assert(dup("BBBB4_2099-01-03") === "passed")

    val outdated = verdicts("outdated")
    assert(outdated("AAAA3_2000-01-01") === "failed")
    assert(outdated("AAAA3_2099-01-01") === "passed")

    val typeM = verdicts("type_mismatch")
    assert(typeM("_2099-01-02") === "failed")    // 'oops' not castable to double
    assert(typeM("AAAA3_2099-01-01") === "passed")
    assert(typeM("BBBB4_2099-01-03") === "passed") // null is not a type failure

    val rules = verdicts("outside_of_rules", "high < low")
    assert(rules("AAAA3_2000-01-01") === "passed") // '3.0' < '9.0' satisfies the expression
    assert(rules("AAAA3_2099-01-01") === "passed") // '10.0' < '5.0' lexically true
    assert(rules("_2099-01-02") === "failed")      // 'oops' < '5.0' false → NOT expr
    assert(rules("BBBB4_2099-01-03") === "failed") // null column

    val notIn = verdicts("not_in_list")
    assert(notIn("AAAA3_2099-01-01") === "passed") // 'open' in normalized list
    assert(notIn("_2099-01-02") === "passed")      // 'OPEN ' trims+lowers into list
    assert(notIn("AAAA3_2000-01-01") === "failed") // 'weird'
    assert(notIn("BBBB4_2099-01-03") === "passed") // null → three-valued isin → passed

    val pattern = verdicts("pattern_mismatch", "ticker shape")
    assert(pattern("_2099-01-02") === "failed")
    assert(pattern("AAAA3_2099-01-01") === "passed")
  }

  test("single-pass output is identical to union form") {
    val checker = new Checker(fixture, meta, runDate)
    val union = checker.annotate().collect().map(_.toString).sorted.toSeq
    val single = checker.annotateSinglePass().collect().map(_.toString).sorted.toSeq
    assert(union === single)
  }
}
