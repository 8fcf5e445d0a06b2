package graft.quality

import java.time.LocalDate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.meta.{ColumnMeta, TableMeta, TestSpec}

/** Per-table expectation runner (SURVEY.md §2.11 orchestration;
  * /root/reference/lib/checker.py:14-312). Takes a table's DataFrame +
  * declared metadata and produces the long-format result frame, one row
  * per (table row × test):
  * `(df_key, test_type, mandate, column, test_name, run_date,
  *   check_result: passed|failed, check_score: 0|1)`.
  *
  * `runDate` is a driver-side constant per run — the reference stamps
  * `datetime.date.today()` as a literal (checker.py:127), NOT SQL
  * `current_date()`; reproduced for identical semantics (SURVEY §2.3 P10).
  *
  * Two physically distinct, result-identical evaluation modes:
  *  - [[annotate]] — the reference's shape: one projection per test,
  *    N-way unionByName (checker.py:286-308). N passes over the scan.
  *  - [[annotateSinglePass]] — engine improvement (SURVEY §7.5): ONE
  *    projection computes every verdict, `inline` explodes to the long
  *    format. One scan + one generate, stays in whole-stage codegen —
  *    the difference between N×100 TB and 1×100 TB read.
  */
final class Checker(df: DataFrame, meta: TableMeta,
                    runDate: LocalDate = LocalDate.now()) {

  import Checker._

  val dfKey = "df_key"

  /** df + composite key from all `key: true` columns
    * (checker.py:92-100), validated against the frame.
    */
  val keyed: DataFrame = {
    val keys = meta.keyColumns
    if (keys.isEmpty) throw new IllegalArgumentException("No key column found in schema.")
    val missingKeys = keys.filterNot(df.columns.contains)
    if (missingKeys.nonEmpty)
      throw new IllegalArgumentException(
        s"Key column(s) not found in DataFrame: ${missingKeys.mkString(",")}")
    df.withColumn(dfKey, concat_ws("_", keys.map(k => col(k).cast("string")): _*))
  }

  private val tests: Seq[(ColumnMeta, TestSpec)] = meta.columnTests

  /** Compile one test's failure predicate (dispatch table,
    * checker.py:286-295).
    */
  private def failurePredicate(c: ColumnMeta, t: TestSpec): Column = t.testType match {
    case "missing" => Checks.missing(c.name)
    case "duplicated" => Checks.duplicated(c.name, dfKey)
    case "outdated" =>
      val threshold = t.kwargs.getOrElse("threshold",
        throw new IllegalArgumentException(s"outdated on ${c.name}: no threshold")).toInt
      Checks.outdated(c.name, threshold)
    case "outside_of_rules" =>
      Checks.outsideOfRules(c.name, t.kwargs.getOrElse("expression",
        throw new IllegalArgumentException(s"outside_of_rules on ${c.name}: no expression")))
    case "not_in_list" =>
      Checks.notInList(c.name, t.listKwargs.getOrElse("expected_values",
        throw new IllegalArgumentException(s"not_in_list on ${c.name}: no expected_values")))
    case "pattern_mismatch" =>
      Checks.patternMismatch(c.name, t.kwargs.getOrElse("pattern",
        throw new IllegalArgumentException(s"pattern_mismatch on ${c.name}: no pattern")))
    case "type_mismatch" => Checks.typeMismatch(c.name, typeNameOf(c))
    case other => throw new IllegalArgumentException(s"Unsupported expectation type: $other")
  }

  private def typeNameOf(c: ColumnMeta) = c.dataType.typeName match {
    case "integer" => "int"
    case t => t
  }

  /** Reference-faithful mode: per-test projection + unionByName fold. */
  def annotate(): DataFrame = {
    require(tests.nonEmpty, s"no tests declared")
    val frames = tests.map { case (c, t) =>
      val test = failurePredicate(c, t)
      keyed.select(
        col(dfKey),
        lit(t.testType).as("test_type"),
        lit(c.mandate.getOrElse("")).as("mandate"),
        lit(c.name).as("column"),
        lit(t.testName).as("test_name"),
        lit(java.sql.Date.valueOf(runDate)).as("run_date"),
        when(test, "failed").otherwise(lit("passed")).as("check_result"),
        when(test, lit(0)).otherwise(lit(1)).as("check_score"))
    }
    frames.reduce(_ unionByName _)
  }

  /** Single-pass mode: every verdict in one projection, then `inline`
    * to long format. Output is row-for-row identical to [[annotate]]
    * (verified by spec).
    */
  def annotateSinglePass(): DataFrame = {
    require(tests.nonEmpty, s"no tests declared")
    // Window-based predicates (duplicated) must sit at the top of a
    // Project, not inside the generator — materialize every verdict as a
    // column first (plain predicates still fuse into one codegen stage;
    // each distinct window spec adds its one unavoidable shuffle).
    val failNames = tests.indices.map(i => s"__fail_$i")
    val withFails = tests.zip(failNames).foldLeft(keyed) {
      case (d, ((c, t), name)) => d.withColumn(name, failurePredicate(c, t))
    }
    val entries: Seq[Column] = tests.zip(failNames).map { case ((c, t), name) =>
      val test = col(name)
      struct(
        lit(t.testType).as("test_type"),
        lit(c.mandate.getOrElse("")).as("mandate"),
        lit(c.name).as("column"),
        lit(t.testName).as("test_name"),
        lit(java.sql.Date.valueOf(runDate)).as("run_date"),
        when(test, "failed").otherwise(lit("passed")).as("check_result"),
        when(test, lit(0)).otherwise(lit(1)).as("check_score"))
    }
    withFails
      .select(col(dfKey), inline(array(entries: _*)))
      .select(col(dfKey), col("test_type"), col("mandate"), col("column"),
        col("test_name"), col("run_date"), col("check_result"), col("check_score"))
  }

  def annotate(singlePass: Boolean): DataFrame =
    if (singlePass) annotateSinglePass() else annotate()
}

object Checker {
  /** The long result schema's column order (checker.py:121-130). */
  val resultColumns: Seq[String] = Seq("df_key", "test_type", "mandate",
    "column", "test_name", "run_date", "check_result", "check_score")
}
