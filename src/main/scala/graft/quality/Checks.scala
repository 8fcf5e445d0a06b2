package graft.quality

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The seven declarative expectation operators Q1-Q7 (SURVEY.md §2.11),
  * each a pure config → `Column` failure-predicate compiler — true means
  * the row FAILS the expectation. Mirrors
  * /root/reference/lib/checker.py:134-275, with the two documented
  * reference bugs fixed to intended semantics:
  *  - `not_in_list` membership tests a flat value list, not a nested
  *    list object (checker.py:227);
  *  - `pattern_mismatch` reads the pattern from test kwargs
  *    (checker.py:240 reads a top-level key that never exists, so the
  *    reference path always errored — logs confirm).
  *
  * These compile to built-in codegen'd expressions — no UDFs — so at
  * 100 TB every check rides whole-stage codegen over a single scan.
  */
object Checks {

  /** Q1 `missing`: null, empty string, or the '0.0' sentinel
    * (checker.py:145-146).
    */
  def missing(column: String): Column =
    col(column).isNull || col(column).cast("string").isin("", "0.0")

  /** Q2 `duplicated`: 2nd+ occurrence of a value, ordered by the
    * composite row key (checker.py:163-165). Window-based: one shuffle
    * on the checked column.
    */
  def duplicated(column: String, dfKey: String): Column =
    row_number().over(Window.partitionBy(column).orderBy(col(dfKey))) > 1

  /** Q3 `outdated`: strictly older than `threshold` days before the
    * run's current_date (checker.py:187).
    */
  def outdated(column: String, threshold: Int): Column =
    col(column) < date_sub(current_date(), threshold)

  /** Q4 `outside_of_rules`: null or NOT matching the YAML SQL rule
    * (checker.py:202-207) — string-to-Column compilation via expr.
    */
  def outsideOfRules(column: String, rule: String): Column =
    col(column).isNull || !expr(rule)

  /** Q5 `not_in_list`: normalized value not in the expected list
    * (checker.py:226-227, intended flat-list semantics).
    */
  def notInList(column: String, expected: Seq[String]): Column = {
    val normalized = expected.map(_.toLowerCase)
    !lower(trim(col(column))).isin(normalized: _*)
  }

  /** Q6 `pattern_mismatch`: value does not match the regex; the pattern
    * is validated driver-side first (checker.py:244-250).
    */
  def patternMismatch(column: String, pattern: String): Column = {
    java.util.regex.Pattern.compile(pattern) // fail loudly before planning
    !col(column).rlike(pattern)
  }

  /** Q7 `type_mismatch`: value present but not castable to the declared
    * type (checker.py:270-271; relies on ANSI-off null-on-cast-failure,
    * so we use try_cast-equivalent semantics explicitly).
    */
  def typeMismatch(column: String, typeName: String): Column =
    col(column).try_cast(typeName).isNull && col(column).isNotNull
}
