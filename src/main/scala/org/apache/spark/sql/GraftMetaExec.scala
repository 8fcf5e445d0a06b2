package org.apache.spark.sql

/** Re-bind a DataFrame's (already-analyzed) logical plan onto another
  * SparkSession for execution — the bridge the warehouse uses to run
  * its commit-scale INTERNAL metadata aggregates on a dedicated
  * isolated session (AQE off, narrow fixed width) without mutating the
  * shared session's conf. Logical plans are session-independent; only
  * the execution context (conf, planner) changes. Lives in this
  * package because `classic.Dataset.ofRows` is `private[sql]`.
  */
object GraftMetaExec {
  def onSession(s: SparkSession, df: DataFrame): DataFrame =
    classic.Dataset.ofRows(s.asInstanceOf[classic.SparkSession],
      df.queryExecution.analyzed)
}
