package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.IntegerType

import graft.catalog.TableStatsRegistry
import graft.functions.SortTopK

/** Optimizer rule: rewrite the top-k-per-group window idiom
  *
  * {{{ Filter(rn <= k, Window([row_number() OVER (PARTITION BY p ORDER BY o) AS rn], child)) }}}
  *
  * into a bounded-heap aggregate + explode:
  *
  * {{{ Project(child.* , pos+1 AS rn,
  *       Generate(posexplode(top),
  *         Aggregate(p, [sort_topk(struct(child.*), struct(o), k) AS top], child))) }}}
  *
  * The window form shuffles and sorts EVERY row of every group before
  * discarding all but k; the aggregate form reduces each map task's
  * slice of a group to at most k rows BEFORE the exchange (partial
  * ObjectHashAggregate), so the shuffle carries |groups| × k rows. This
  * is the QUALIFY/top-k pushdown engines like Databricks apply — here
  * it accelerates every latest-per-key (W1) dedup in the engine
  * transparently, and the DuckDB gate hash-verifies the rewrite across
  * all of them.
  *
  * Fires only on the exact safe shape: a single row_number window
  * expression, deterministic partition/order expressions, a
  * stand-alone bound predicate (`<= k`, `< k+1`, `= 1`, `k >= rn`)
  * over the row-number output. Rows tied on the full sort key keep an
  * arbitrary winner — precisely row_number's own nondeterminism on
  * ties.
  *
  * Cardinality trade-off (measured): the aggregate wins when groups
  * are much smaller than the input (per-customer top-k, latest-per-key
  * over a keyed stream) and loses when keys are near-unique (dedup by
  * content fingerprint: every group is a singleton, so partial
  * aggregation only adds buffer serialization). OSS Spark has no
  * catalog stats for path tables, so the rule consults the warehouse's
  * OWN write-time statistics (graft.catalog.TableStatsRegistry, fed by
  * `_graft_stats` manifests): when a partition key's summed per-file
  * approximate NDV is ≥ `spark.graft.topkRewrite.ndvSkipRatio`
  * (default 0.9) of the row count, map-side combining cannot shrink
  * the shuffle and the window form is kept. The per-file SUM — not a
  * global NDV — is the right signal: keys repeated only across files
  * do not combine map-side either. Tables without stats rewrite as
  * before; `spark.graft.topkRewrite.enabled=false` still force-disables.
  */
object RowNumberTopKRewrite extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.topkRewrite.enabled"
  val NdvSkipRatioKey = "spark.graft.topkRewrite.ndvSkipRatio"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(EnabledKey, "true").toBoolean) plan
    else plan.transformUp {
      case f @ Filter(cond, w: Window) =>
        matchPattern(cond, w).getOrElse(f)
    }

  private def matchPattern(cond: Expression, w: Window): Option[LogicalPlan] =
    w.windowExpressions match {
      case Seq(alias @ Alias(WindowExpression(RowNumber(), _), _))
          if w.orderSpec.nonEmpty &&
            w.partitionSpec.forall(_.deterministic) &&
            w.orderSpec.forall(_.child.deterministic) &&
            !nearUniquePartitionKeys(w) =>
        extractBound(cond, alias.exprId).filter(_ >= 1).map(rewrite(w, alias, _))
      case _ => None
    }

  /** True when write-time stats prove the partition keys are
    * near-unique (the measured regime where the heap aggregate only
    * adds buffer overhead). Conservative: any key column without a
    * registered NDV, any aliased/computed key, or a ratio config > 1
    * keeps the rewrite enabled.
    */
  private def nearUniquePartitionKeys(w: Window): Boolean = {
    val ratio =
      try conf.getConfString(NdvSkipRatioKey, "0.9").toDouble
      catch { case _: NumberFormatException => 0.9 }
    if (!(ratio <= 1.0)) return false // > 1 (or NaN) disables the skip
    val attrs = w.partitionSpec.collect { case a: AttributeReference => a }
    if (attrs.isEmpty) return false
    val rels = w.child.collect {
      case lr: LogicalRelation if lr.relation.isInstanceOf[HadoopFsRelation] => lr
    }
    attrs.exists { a =>
      rels.filter(_.outputSet.contains(a)).exists { lr =>
        lr.relation.asInstanceOf[HadoopFsRelation]
          .location.rootPaths.headOption
          .flatMap(statsForPath)
          .exists(st => st.rows > 0 &&
            st.ndv.get(a.name).exists(_.toDouble / st.rows >= ratio))
      }
    }
  }

  /** Registry stats for a scan root. Snapshot reads enumerate explicit
    * data FILES (the version's list), so the scan root may sit one or
    * two levels below the table directory the stats are registered
    * under — walk up a bounded number of ancestors (file → partition
    * dir → table dir) until a registered path matches.
    */
  private def statsForPath(p: org.apache.hadoop.fs.Path)
      : Option[TableStatsRegistry.TableStats] = {
    var cur = p
    var hops = 0
    while (cur != null && hops < 4) {
      val hit = TableStatsRegistry.get(cur.toString)
      if (hit.isDefined) return hit
      cur = cur.getParent
      hops += 1
    }
    None
  }

  /** k from `rn <= k` / `rn < k+1` / `rn = 1` / `k >= rn` / `k > rn-…`
    * — the literal must be the sole other operand.
    */
  private def extractBound(cond: Expression, rn: ExprId): Option[Int] = cond match {
    case LessThanOrEqual(a: AttributeReference, Literal(v: Int, IntegerType))
        if a.exprId == rn => Some(v)
    case LessThan(a: AttributeReference, Literal(v: Int, IntegerType))
        if a.exprId == rn => Some(v - 1)
    case EqualTo(a: AttributeReference, Literal(v: Int, IntegerType))
        if a.exprId == rn && v == 1 => Some(1)
    case EqualTo(Literal(v: Int, IntegerType), a: AttributeReference)
        if a.exprId == rn && v == 1 => Some(1)
    case GreaterThanOrEqual(Literal(v: Int, IntegerType), a: AttributeReference)
        if a.exprId == rn => Some(v)
    case GreaterThan(Literal(v: Int, IntegerType), a: AttributeReference)
        if a.exprId == rn => Some(v - 1)
    case _ => None
  }

  private def rewrite(w: Window, rnAlias: Alias, k: Int): LogicalPlan = {
    val child = w.child
    // index-based struct field names: child output names may collide
    val payload = CreateNamedStruct(child.output.zipWithIndex.flatMap {
      case (a, i) => Seq(Literal(s"c$i"), a)
    })
    val sortKey = CreateNamedStruct(w.orderSpec.zipWithIndex.flatMap {
      case (so, i) => Seq(Literal(s"k$i"), so.child)
    })
    val agg = SortTopK(payload, sortKey,
      w.orderSpec.map(_.direction == Ascending),
      w.orderSpec.map(_.nullOrdering == NullsFirst), k)
    val topAlias = Alias(agg.toAggregateExpression(), "__graft_topk")()
    val aggregated = Aggregate(w.partitionSpec, Seq(topAlias), child)

    val posAttr = AttributeReference("__pos", IntegerType, nullable = false)()
    val rowAttr = AttributeReference("__row", payload.dataType, nullable = false)()
    val exploded = Generate(PosExplode(topAlias.toAttribute),
      unrequiredChildIndex = Seq(0), outer = false, qualifier = None,
      generatorOutput = Seq(posAttr, rowAttr), aggregated)

    // restore the ORIGINAL attribute ids so parent operators resolve
    val restored = child.output.zipWithIndex.map { case (a, i) =>
      Alias(GetStructField(rowAttr, i, Some(s"c$i")), a.name)(
        exprId = a.exprId, qualifier = a.qualifier)
    }
    val rnRestored = Alias(Add(posAttr, Literal(1)), rnAlias.name)(
      exprId = rnAlias.exprId, qualifier = rnAlias.qualifier)
    Project(restored :+ rnRestored, exploded)
  }
}

/** Session extension enabling the rewrite:
  * `spark.sql.extensions=graft.functions.GraftExtensions,graft.plans.GraftOptimizations`.
  */
class GraftOptimizations extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RowNumberTopKRewrite)
    // SQL reads over tables with live deletion vectors rewrite into
    // the warehouse's DV-applying plan (graft.catalog.DvReadRewrite);
    // without this rule the scan builder refuses loudly
    ext.injectOptimizerRule(_ => graft.catalog.DvReadRewrite)
    // SQL MERGE INTO over graft catalog tables → the engine's own
    // file-pruned incremental upsert (graft.catalog.SqlMerge — the
    // Delta-style analyzer claim; unsupported shapes fall through to
    // Spark's loud row-level-operation error)
    ext.injectResolutionRule(session => graft.catalog.SqlMerge.rule(session))
    // MERGE WITH SCHEMA EVOLUTION onto an identity-carrying target
    // refuses in the HINT batch — before Spark's evolution rule
    // commits the widening — so evolution stays atomic with a merge
    // that is statically known to refuse
    ext.injectHintResolutionRule(session =>
      graft.catalog.SqlMerge.preEvolutionGuard(session))
  }
}
