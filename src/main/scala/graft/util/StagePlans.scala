package graft.util

import org.apache.spark.sql.DataFrame

/** Conf-gated stage-plan dumps for operators whose public plan is an
  * eager-checkpoint barrier (`Scan ExistingRDD`): with
  * `spark.graft.explainStages=true` (set by `graft.Explain`), the
  * interesting INTERNAL stage — the containment verify join, the
  * curate scoring projection — prints its `explain("formatted")`
  * before materializing, so plan shape stays reviewable without the
  * Spark UI. Off (the default) this is a zero-cost pass-through.
  */
object StagePlans {
  def dump(tag: String, df: DataFrame): DataFrame = {
    if (df.sparkSession.conf
          .get("spark.graft.explainStages", "false").toBoolean) {
      println(s"\n---------- stage plan: $tag ----------")
      df.explain("formatted")
    }
    df
  }
}
