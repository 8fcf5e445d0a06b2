package graft.catalog

import org.apache.spark.sql.catalyst.expressions.{Alias, Cast, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** SQL reads of tables with LIVE deletion vectors: rewrite the DSv2
  * relation into the warehouse's DV-applying read plan (clean-file
  * scan unioned with the dv'd-file scan anti-joined against its
  * position sidecars — exactly [[Warehouse.readSnapshot]]), so
  * `SELECT * FROM graft...` agrees with the Scala surface while
  * vectors are unmaterialized. Registered by
  * `graft.plans.GraftOptimizations`; sessions without the extensions
  * hit the loud reader-gating refusal in the scan builder instead
  * (Delta's reader-protocol-version model: never silently resurrect
  * deleted rows).
  *
  * Scope: READ positions only. Row-level DML keeps its relation — the
  * DELETE/UPDATE/MERGE target dispatches through `SupportsDelete` /
  * the warehouse entry points, which are DV-aware themselves; a MERGE
  * source still rewrites.
  */
object DvReadRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case d: DeleteFromTable => d
    case u: UpdateTable => u
    case m: MergeIntoTable => m.copy(sourceTable = apply(m.sourceTable))
    case _ => plan.transformDownWithSubqueries {
      case r: DataSourceV2Relation if needsDv(r) => rewrite(r)
    }
  }

  private def needsDv(r: DataSourceV2Relation): Boolean = r.table match {
    // live deletion vectors OR shallow-clone foreign entries: either
    // way the plain file-index scan would lie, and readSnapshot is
    // the plan that tells the truth
    case t: GraftSqlTable => t.snap.dvMap.nonEmpty || t.hasForeign
    case _ => false
  }

  private def rewrite(r: DataSourceV2Relation): LogicalPlan = {
    val t = r.table.asInstanceOf[GraftSqlTable]
    val resolved = t.wh.readSnapshot(t.snap).queryExecution.analyzed
    val byName = resolved.output.map(a => a.name.toLowerCase -> a).toMap
    // re-expose the substituted plan under the RELATION's attribute ids
    // (and its column order / partition-value types — the file index
    // may have inferred a different partition type than the committed
    // schema declares)
    val projs: Seq[NamedExpression] = r.output.map { old =>
      val n = byName.getOrElse(old.name.toLowerCase,
        throw new IllegalStateException(
          s"DvReadRewrite: ${t.snap.ref} read plan lacks column " +
            s"'${old.name}' (has ${resolved.output.map(_.name).mkString(",")})"))
      val e = if (n.dataType == old.dataType) n else Cast(n, old.dataType)
      Alias(e, old.name)(exprId = old.exprId, qualifier = old.qualifier)
    }
    Project(projs, resolved)
  }
}
