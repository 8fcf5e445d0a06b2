package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** QUALIFY support for OSS Spark. The reference's transforms use
  * Databricks SQL `QUALIFY <window predicate>` in all four table queries
  * (e.g. /root/reference/bronze/assets/assets.sql:11,
  * silver/prices/prices.sql:14); OSS Spark 4.1.2 has no QUALIFY
  * (PARSE_SYNTAX_ERROR — SURVEY.md §2.6 W1). We rewrite at the string
  * level: the query minus its QUALIFY clause becomes a subquery, the
  * predicate is evaluated as a window expression over it, and rows are
  * filtered on the result — exactly QUALIFY's evaluate-after-SELECT
  * semantics (aliases from the SELECT list are real columns of the
  * subquery).
  */
object QualifyRewrite {

  /** Split a SQL text into (query-without-QUALIFY, Some(predicate)) or
    * (query, None). Only a top-level QUALIFY (outside parens, quotes,
    * backticks, comments) splits; the predicate runs to the end of the
    * statement (the reference always writes QUALIFY last).
    */
  def split(sql: String): (String, Option[String]) = {
    val s = sql
    var depth = 0
    var i = 0
    var inSingle = false
    var inDouble = false
    var inBacktick = false
    var inLineComment = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inLineComment) { if (c == '\n') inLineComment = false }
      else if (inSingle) { if (c == '\'') inSingle = false }
      else if (inDouble) { if (c == '"') inDouble = false }
      else if (inBacktick) { if (c == '`') inBacktick = false }
      else c match {
        case '\'' => inSingle = true
        case '"' => inDouble = true
        case '`' => inBacktick = true
        case '-' if i + 1 < s.length && s.charAt(i + 1) == '-' => inLineComment = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case 'q' | 'Q' if depth == 0 && isKeywordAt(s, i, "QUALIFY") =>
          val before = s.substring(0, i)
          val pred = s.substring(i + "QUALIFY".length).trim.stripSuffix(";").trim
          require(pred.nonEmpty, "QUALIFY with empty predicate")
          return (before, Some(pred))
        case _ =>
      }
      i += 1
    }
    (s, None)
  }

  private def isKeywordAt(s: String, i: Int, kw: String): Boolean = {
    if (i + kw.length > s.length) return false
    if (!s.regionMatches(true, i, kw, 0, kw.length)) return false
    val beforeOk = i == 0 || !isIdentChar(s.charAt(i - 1))
    val afterOk = i + kw.length == s.length || !isIdentChar(s.charAt(i + kw.length))
    beforeOk && afterOk
  }

  private def isIdentChar(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '_'
}

/** Runs the reference's `.sql` transform files on OSS Spark:
  * three-part `catalog.schema.table` names resolve against registered
  * temp views (OSS local catalogs are two-level), and QUALIFY is
  * rewritten (SURVEY.md §7.4). SQL-on-session entry point S7
  * (lib/ingestors.py:83-84,121).
  */
object Transform {

  /** Replace each known three-part table name (bare or fully
    * backtick-quoted, as the reference writes them) with its view name.
    * Only *known* names are touched — a generic 3-part regex would
    * false-positive on `alias.struct.field` paths.
    */
  def resolveTableNames(sql: String, tables: Map[String, String]): String =
    tables.foldLeft(sql) { case (q, (threePart, view)) =>
      val Array(c, sc, t) = threePart.split('.')
      val quoted = s"`$c`\\s*\\.\\s*`$sc`\\s*\\.\\s*`$t`"
      val bare = s"\\b${java.util.regex.Pattern.quote(c)}\\s*\\.\\s*${java.util.regex.Pattern.quote(sc)}\\s*\\.\\s*${java.util.regex.Pattern.quote(t)}\\b"
      q.replaceAll(quoted, view).replaceAll(bare, view)
    }

  /** Execute a transform, applying name resolution then the QUALIFY
    * rewrite. The window predicate is computed as a single extra column
    * over the original query (one `WindowExec`; no extra shuffle beyond
    * what QUALIFY itself implies) and dropped after the filter.
    */
  def sql(spark: SparkSession, query: String,
          tables: Map[String, String] = Map.empty): DataFrame = {
    val resolved = resolveTableNames(query, tables)
    QualifyRewrite.split(resolved) match {
      case (inner, Some(pred)) =>
        spark.sql(s"SELECT *, ($pred) AS __qualify FROM (\n$inner\n) __qualify_input")
          .filter(col("__qualify"))
          .drop("__qualify")
      case (full, None) =>
        spark.sql(full)
    }
  }
}
