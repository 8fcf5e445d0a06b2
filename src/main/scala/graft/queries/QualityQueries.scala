package graft.queries

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.meta.TableMeta
import graft.quality.Checker

/** The data-quality engine (SURVEY §2.11 Q1-Q7 + §2.7 A1) exercised
  * inside the DuckDB-checked gate: the actual Checker runs over the
  * orders table with declarative YAML metadata; the oracle re-derives
  * every verdict in SQL. `run_date` is projected out — it is a
  * driver-side constant (reference semantics) and would only flake the
  * comparison at midnight.
  */
object QualityQueries {

  type Q = (SparkSession, String) => DataFrame

  /** orders metadata: one test per check family with non-trivial
    * verdicts ('P' status fails not_in_list; priorities pass pattern).
    */
  private[graft] val scorecardYaml: String =
    """schema:
      |  - name: 'o_orderkey'
      |    type: 'long'
      |    nullable: false
      |    mandate: 'global_required'
      |    key: true
      |    tests:
      |      - test_type: missing
      |      - test_type: type_mismatch
      |  - name: 'o_custkey'
      |    type: 'long'
      |    mandate: 'global_required'
      |    tests:
      |      - test_type: duplicated
      |  - name: 'o_orderstatus'
      |    type: 'string'
      |    mandate: 'global_required'
      |    tests:
      |      - test_type: not_in_list
      |        test_name: 'status open or finished'
      |        kwargs:
      |          expected_values:
      |            - 'O'
      |            - 'F'
      |  - name: 'o_totalprice'
      |    type: 'double'
      |    mandate: 'global_required'
      |    tests:
      |      - test_type: outside_of_rules
      |        test_name: 'positive price'
      |        kwargs:
      |          expression: o_totalprice > 0
      |  - name: 'o_orderpriority'
      |    type: 'string'
      |    mandate: 'local_required'
      |    tests:
      |      - test_type: pattern_mismatch
      |        test_name: 'priority shape'
      |        kwargs:
      |          pattern: '^[1-5]-[A-Z ]+$'
      |""".stripMargin

  private def annotated(spark: SparkSession, dir: String): DataFrame =
    new Checker(
      Tables.load(spark, dir, "orders"),
      TableMeta.fromYamlString(scorecardYaml),
      LocalDate.now()).annotateSinglePass()

  def qQualityChecks(spark: SparkSession, dir: String): DataFrame =
    annotated(spark, dir)
      .select("df_key", "test_type", "mandate", "column", "test_name",
        "check_result", "check_score")

  /** Oracle: each test family re-derived in portable SQL over the same
    * table. df_key ordering inside `duplicated` is the STRING order of
    * the composite key — both engines default to binary collation.
    */
  val qQualityChecksSql: String =
    """WITH k AS (SELECT *, CAST(o_orderkey AS VARCHAR) AS df_key FROM orders)
      |SELECT df_key, 'missing' AS test_type, 'global_required' AS mandate,
      |  'o_orderkey' AS "column", '' AS test_name,
      |  CASE WHEN o_orderkey IS NULL OR CAST(o_orderkey AS VARCHAR) IN ('', '0.0')
      |       THEN 'failed' ELSE 'passed' END AS check_result,
      |  CASE WHEN o_orderkey IS NULL OR CAST(o_orderkey AS VARCHAR) IN ('', '0.0')
      |       THEN 0 ELSE 1 END AS check_score
      |FROM k
      |UNION ALL
      |SELECT df_key, 'type_mismatch', 'global_required', 'o_orderkey', '',
      |  CASE WHEN TRY_CAST(o_orderkey AS BIGINT) IS NULL AND o_orderkey IS NOT NULL
      |       THEN 'failed' ELSE 'passed' END,
      |  CASE WHEN TRY_CAST(o_orderkey AS BIGINT) IS NULL AND o_orderkey IS NOT NULL
      |       THEN 0 ELSE 1 END
      |FROM k
      |UNION ALL
      |SELECT df_key, 'duplicated', 'global_required', 'o_custkey', '',
      |  CASE WHEN rn > 1 THEN 'failed' ELSE 'passed' END,
      |  CASE WHEN rn > 1 THEN 0 ELSE 1 END
      |FROM (SELECT df_key,
      |        row_number() OVER (PARTITION BY o_custkey ORDER BY df_key) AS rn
      |      FROM k)
      |UNION ALL
      |SELECT df_key, 'not_in_list', 'global_required', 'o_orderstatus',
      |  'status open or finished',
      |  CASE WHEN NOT (lower(trim(o_orderstatus)) IN ('o', 'f'))
      |       THEN 'failed' ELSE 'passed' END,
      |  CASE WHEN NOT (lower(trim(o_orderstatus)) IN ('o', 'f'))
      |       THEN 0 ELSE 1 END
      |FROM k
      |UNION ALL
      |SELECT df_key, 'outside_of_rules', 'global_required', 'o_totalprice',
      |  'positive price',
      |  CASE WHEN o_totalprice IS NULL OR NOT (o_totalprice > 0)
      |       THEN 'failed' ELSE 'passed' END,
      |  CASE WHEN o_totalprice IS NULL OR NOT (o_totalprice > 0)
      |       THEN 0 ELSE 1 END
      |FROM k
      |UNION ALL
      |SELECT df_key, 'pattern_mismatch', 'local_required', 'o_orderpriority',
      |  'priority shape',
      |  CASE WHEN NOT regexp_matches(o_orderpriority, '^[1-5]-[A-Z ]+$')
      |       THEN 'failed' ELSE 'passed' END,
      |  CASE WHEN NOT regexp_matches(o_orderpriority, '^[1-5]-[A-Z ]+$')
      |       THEN 0 ELSE 1 END
      |FROM k""".stripMargin

  /** A1: the scorecard aggregate over the annotated frame
    * (checker_handler.py:139-154) — avg score + conditional sums.
    */
  def qQualityAgg(spark: SparkSession, dir: String): DataFrame =
    annotated(spark, dir)
      .groupBy("test_type", "column", "test_name", "mandate")
      .agg(
        round(avg("check_score"), 6).as("total_score"),
        count(lit(1)).as("columns_checked"),
        sum(when(col("check_result") === "passed", 1).otherwise(0)).as("passing_cols"),
        sum(when(col("check_result") === "passed", 0).otherwise(1)).as("failing_cols"))

  val qQualityAggSql: String =
    s"""SELECT test_type, "column", test_name, mandate,
       |  round(avg(check_score), 6) AS total_score,
       |  count(*) AS columns_checked,
       |  CAST(sum(CASE WHEN check_result = 'passed' THEN 1 ELSE 0 END) AS BIGINT) AS passing_cols,
       |  CAST(sum(CASE WHEN check_result = 'passed' THEN 0 ELSE 1 END) AS BIGINT) AS failing_cols
       |FROM (${qQualityChecksSql.replace("\n", "\n      ")})
       |GROUP BY test_type, "column", test_name, mandate""".stripMargin

  def queries: Map[String, Q] = Map(
    "q_quality_checks" -> (qQualityChecks _),
    "q_quality_agg" -> (qQualityAgg _))

  def oracles: Map[String, String] = Map(
    "q_quality_checks" -> qQualityChecksSql,
    "q_quality_agg" -> qQualityAggSql)
}
