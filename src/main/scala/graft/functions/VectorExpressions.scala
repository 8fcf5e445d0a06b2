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

/** argmax-cosine against a LITERAL eval matrix:
  * `graft_best_cosine(vec, evalVecs, evalIds)` returns
  * `struct<c: double, e: long>` — the maximum cosine over every eval
  * vector and, on cosine ties, the LARGER eval id (the same total
  * order as `array_max` over `struct(cosine, id)`, which this
  * expression replaces in [[graft.text.Decontaminate.semanticHits]]).
  *
  * Why an expression and not an unfolded projection: 1024 per-eval
  * cosine structs in one Project blow Janino's method-size limit and
  * silently de-codegen the whole stage. Here the matrix is ONE
  * reference object (decoded once per executor, eval norms
  * precomputed) and the generated code is a single call — whole-stage
  * codegen keeps the scan→filter pipeline fused no matter how many
  * eval vectors ride along. Same per-pair fold order and zero-norm
  * convention as [[CosineSimilarity]], so values are bit-identical to
  * the portable path.
  */
case class BestCosineMatch(first: Expression, second: Expression,
                           third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def prettyName: String = "graft_best_cosine"

  override def dataType: DataType = StructType(Seq(
    StructField("c", DoubleType, nullable = false),
    StructField("e", LongType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    def vecOk(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    val matrixOk = second.dataType match {
      case ArrayType(inner, _) => vecOk(inner)
      case _ => false
    }
    val idsOk = third.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (!vecOk(first.dataType) || !matrixOk || !idsOk)
      TypeCheckFailure(s"$prettyName expects (array<float|double>, " +
        "array<array<float|double>>, array<bigint>), got " +
        s"${first.dataType.catalogString}, ${second.dataType.catalogString}, " +
        s"${third.dataType.catalogString}")
    else if (!second.foldable || !third.foldable)
      TypeCheckFailure(s"$prettyName eval matrix and ids must be literals")
    else TypeCheckSuccess
  }

  private def elemIsFloat(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** (eval vectors as double[][], eval ids, precomputed eval norms) —
    * decoded from the foldable children once per executor.
    */
  @transient private lazy val decoded: (Array[Array[Double]], Array[Long], Array[Double]) = {
    val vecsData = second.eval(null).asInstanceOf[ArrayData]
    val idsData = third.eval(null).asInstanceOf[ArrayData]
    val innerFloat = second.dataType match {
      case ArrayType(ArrayType(FloatType, _), _) => true
      case _ => false
    }
    val n = vecsData.numElements()
    val vecs = Array.tabulate(n) { i =>
      val a = vecsData.getArray(i)
      if (innerFloat) a.toFloatArray().map(_.toDouble) else a.toDoubleArray()
    }
    val ids = idsData.toLongArray()
    require(ids.length == n,
      s"$prettyName: ${n} eval vectors vs ${ids.length} ids")
    require(n > 0, s"$prettyName needs at least one eval vector")
    val norms = vecs.map(v => math.sqrt(v.map(x => x * x).sum))
    (vecs, ids, norms)
  }

  @transient private lazy val vecFloat = elemIsFloat(first.dataType)

  /** The per-row kernel the generated code calls: one pass over the
    * corpus vector per eval vector, best (cosine, id) kept with ties
    * to the larger id.
    */
  def bestRow(a: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val (vecs, ids, norms) = decoded
    val n = a.numElements()
    // decode the corpus vector ONCE per row — the eval loop then runs
    // over primitive arrays only
    val va = new Array[Double](n)
    var na = 0.0
    var i = 0
    while (i < n) {
      val x = if (a.isNullAt(i)) 0.0
        else if (vecFloat) a.getFloat(i).toDouble else a.getDouble(i)
      va(i) = x
      na += x * x
      i += 1
    }
    val normA = math.sqrt(na)
    var bc = Double.NegativeInfinity
    var be = Long.MinValue
    var j = 0
    while (j < vecs.length) {
      val ev = vecs(j)
      val m = math.min(n, ev.length)
      var dot = 0.0
      var k = 0
      while (k < m) {
        dot += va(k) * ev(k)
        k += 1
      }
      val denom = normA * norms(j)
      val c = if (denom == 0.0) 0.0 else dot / denom
      if (c > bc || (c == bc && ids(j) > be)) { bc = c; be = ids(j) }
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bc, be))
  }

  override def nullSafeEval(v: Any, m: Any, ids: Any): Any =
    bestRow(v.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, _, _) => {
      val ref = ctx.addReferenceObj("bestCosine", this, classOf[BestCosineMatch].getName)
      s"${ev.value} = $ref.bestRow($v);"
    })

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
                                                 t: Expression): Expression =
    copy(first = f, second = s, third = t)
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
