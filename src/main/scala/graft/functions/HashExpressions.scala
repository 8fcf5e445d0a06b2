package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared hash math for the dedup signature operators. The portable
  * formulations (graft.dedup.Dedup's `aggregate`/`zip_with` higher-order
  * functions) are correct but interpreted; these helpers implement the
  * SAME math as tight loops for the native expressions below. Both
  * paths must agree bit-for-bit (DedupSpec asserts equality).
  */
object HashOps {

  /** 31-bit prime universal-hash modulus (same P as Dedup). */
  val P: Long = 2147483647L

  /** Spark's xxhash64 seed. */
  val Seed: Long = 42L

  /** Deterministic (a, b) per hash function — splitmix-style scramble
    * of the index so nearby j give uncorrelated parameters.
    */
  def hashParams(j: Int): (Long, Long) = {
    var x = j.toLong * 0x9E3779B97F4A7C15L + 0x6A09E667F3BCC909L
    x ^= x >>> 30; x *= 0xBF58476D1CE4E5B9L
    x ^= x >>> 27; x *= 0x94D049BB133111EBL
    x ^= x >>> 31
    val a = Math.floorMod(x, P - 1) + 1 // 1..P-1
    val b = Math.floorMod(x >>> 17, P)  // 0..P-1
    (a, b)
  }

  /** Identical to Spark's `xxhash64(string)` (XxHash64, seed 42). */
  def xx64(s: UTF8String): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed)
}

/** Native MinHash signature over a token array: k-token shingles
  * (space-joined sliding windows) → xxhash64 → 31-bit reduce → per-j
  * universal hash min-fold. Bit-identical to
  * `Dedup.minhashSignatureHof` (shingle DISTINCTNESS is irrelevant
  * under the min-fold, so the sliding windows are hashed directly).
  * Null token elements cannot produce a shingle (the HOF form's
  * `concat` nulls them out and filters), so windows containing one are
  * skipped.
  */
case class ShingleMinHash(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression {

  require(k >= 1, s"shingle size must be >= 1, got $k")
  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  override def prettyName: String = "graft_minhash"

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string> tokens, got ${dt.catalogString}")
  }

  @transient private lazy val as: Array[Long] =
    Array.tabulate(numHashes)(j => HashOps.hashParams(j)._1)
  @transient private lazy val bs: Array[Long] =
    Array.tabulate(numHashes)(j => HashOps.hashParams(j)._2)
  @transient private lazy val sep = UTF8String.fromString(" ")

  /** Public so generated code can call back into the compiled loop. */
  def compute(tokens: ArrayData): ArrayData = {
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, HashOps.P)
    val n = tokens.numElements()
    if (n >= k) {
      val window = new Array[UTF8String](k)
      var i = 0
      while (i <= n - k) {
        var j = 0
        var hasNull = false
        while (j < k) {
          if (tokens.isNullAt(i + j)) hasNull = true
          else window(j) = tokens.getUTF8String(i + j)
          j += 1
        }
        if (!hasNull) {
          val h = Math.floorMod(
            HashOps.xx64(UTF8String.concatWs(sep, window: _*)), HashOps.P)
          var l = 0
          while (l < numHashes) {
            // h, a < P < 2^31 and b < P, so h*a + b < 2^62: no overflow
            val v = (h * as(l) + bs(l)) % HashOps.P
            if (v < sig(l)) sig(l) = v
            l += 1
          }
        }
        i += 1
      }
    }
    new GenericArrayData(sig)
  }

  override def nullSafeEval(tokens: Any): Any =
    compute(tokens.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("minhashExpr", this, classOf[ShingleMinHash].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native k-token shingle set over a token array: space-joined sliding
  * windows, distinct with first-occurrence order — bit-identical to
  * `Shingles.shinglesHof` (whose zip_with/concat chain nulls out any
  * window containing a null token and filters it, hence the skip here).
  */
case class TokenShingles(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def prettyName: String = "graft_shingles"

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string> tokens, got ${dt.catalogString}")
  }

  @transient private lazy val sep = UTF8String.fromString(" ")

  def compute(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]((n - k + 1) * 2)
    val window = new Array[UTF8String](k)
    var i = 0
    while (i <= n - k) {
      var j = 0
      var hasNull = false
      while (j < k) {
        if (tokens.isNullAt(i + j)) hasNull = true
        else window(j) = tokens.getUTF8String(i + j)
        j += 1
      }
      if (!hasNull) seen.add(UTF8String.concatWs(sep, window: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  override def nullSafeEval(tokens: Any): Any =
    compute(tokens.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("shinglesExpr", this, classOf[TokenShingles].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native 63-bit SimHash over a token array: per-token xxhash64,
  * per-bit ±1 votes, sign → bit. Bit-identical to `Dedup.simhashHof`:
  * Spark's hash expressions are null-tolerant — `xxhash64(null)`
  * returns the seed (42) unchanged — so a null token votes on 42's
  * bit pattern (+1 on bits 1,3,5; -1 elsewhere) exactly like any
  * other hash value (DedupSpec pins this with a null-token row).
  */
case class SimHash63(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_simhash"

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string> tokens, got ${dt.catalogString}")
  }

  def compute(tokens: ArrayData): Long = {
    val votes = new Array[Int](63)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      // HOF twin: xxhash64(null) yields the seed unchanged, so null
      // tokens vote on the seed's bit pattern like any other hash
      val h =
        if (tokens.isNullAt(i)) HashOps.Seed
        else HashOps.xx64(tokens.getUTF8String(i))
      var b = 0
      while (b < 63) {
        if ((h & (1L << b)) != 0) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 63) { if (votes(b) > 0) out |= 1L << b; b += 1 }
    out
  }

  override def nullSafeEval(tokens: Any): Any =
    compute(tokens.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("simhashExpr", this, classOf[SimHash63].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
