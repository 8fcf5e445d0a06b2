package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the ANN hot path.
  *
  * The portable formulation (`zip_with` + `aggregate` higher-order
  * functions, graft.sim.Similarity) is correct but evaluates interpreted
  * — outside whole-stage codegen, one closure dispatch per element. For
  * corpus×query scoring that interpreter tax IS the query cost. These
  * expressions implement the same double-precision sequential fold as a
  * tight Java loop via `doGenCode` (with an interpreted `nullSafeEval`
  * twin for non-codegen paths), so vector scoring fuses into the
  * surrounding stage.
  *
  * Semantics (both expressions): elements are read as doubles
  * (float arrays upcast per element); iteration covers the shorter
  * length, matching zip_with's defined zone; null INPUT arrays yield
  * null (BinaryExpression null-intolerance); null elements are read as
  * 0.0 (document vectors are dense — declared non-null in practice).
  */
abstract class VectorFold extends BinaryExpression {

  override def dataType: DataType = DoubleType

  protected def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"${prettyName} expects array<float|double> inputs, " +
          s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  protected def readElem(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (a.isNullAt(i)) 0.0
    else if (isFloat) a.getFloat(i).toDouble
    else a.getDouble(i)

  /** Java source reading element `i` of array variable `v`. */
  protected def readElemCode(v: String, i: String, isFloat: Boolean): String =
    if (isFloat) s"($v.isNullAt($i) ? 0.0d : (double) $v.getFloat($i))"
    else s"($v.isNullAt($i) ? 0.0d : $v.getDouble($i))"
}

/** dot(a, b) = Σ aᵢ·bᵢ over the common length, in double. */
case class DotProduct(left: Expression, right: Expression) extends VectorFold {

  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (lf, rf) = (elemIsFloat(left), elemIsFloat(right))
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += readElem(x, i, lf) * readElem(y, i, rf)
      i += 1
    }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0d;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ${readElemCode(x, i, elemIsFloat(left))} *
         |          ${readElemCode(y, i, elemIsFloat(right))};
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** cosine(a, b) = dot / (‖a‖·‖b‖); 0.0 when either norm is 0 — same
  * convention as graft.sim.Similarity.cosine. One pass computes all
  * three folds.
  */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorFold {

  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (lf, rf) = (elemIsFloat(left), elemIsFloat(right))
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = readElem(x, i, lf)
      val yv = readElem(y, i, rf)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val denom = ctx.freshName("denom")
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0d, $na = 0.0d, $nb = 0.0d;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = ${readElemCode(x, i, elemIsFloat(left))};
         |  double $yv = ${readElemCode(y, i, elemIsFloat(right))};
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |double $denom = Math.sqrt($na) * Math.sqrt($nb);
         |${ev.value} = ($denom == 0.0d) ? 0.0d : ($dot / $denom);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
