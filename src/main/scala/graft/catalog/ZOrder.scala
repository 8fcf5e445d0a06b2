package graft.catalog

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering key: interleaves the low bits of
  * several non-negative integral columns so that range-clustering on
  * the single z-value co-locates rows that are close in EVERY
  * dimension. Combined with the warehouse's write-time min/max stats,
  * this makes file skipping effective for predicates on ANY of the
  * z-ordered columns — a linear sort key only ever prunes its leading
  * column (the trade: each dimension prunes ~n-th-root as sharply as a
  * dedicated sort would).
  *
  * The expression is a pure bit-shift tree (whole-stage codegen, no
  * UDF). Inputs are clamped to `bits` low bits and must be
  * non-negative — min-max scale or rank-bucket columns of wildly
  * different ranges first, otherwise the wide column dominates the
  * interleave.
  */
object ZOrder {

  /** Morton value of `cols` (2 or more), `bits` low bits each;
    * `cols.size * bits` must fit a signed long (≤ 63).
    */
  def zvalue(cols: Seq[Column], bits: Int = 21): Column = {
    require(cols.size >= 2, s"z-order needs at least 2 columns, got ${cols.size}")
    require(bits >= 1 && cols.size * bits <= 63,
      s"${cols.size} cols × $bits bits must fit 63 bits")
    val n = cols.size
    val mask = lit((1L << bits) - 1)
    val clamped = cols.map(c => c.cast("long").bitwiseAND(mask))
    val terms = for {
      (c, ci) <- clamped.zipWithIndex
      b <- 0 until bits
    } yield shiftleft(shiftrightunsigned(c, b).bitwiseAND(lit(1L)), b * n + ci)
    terms.reduce(_ bitwiseOR _)
  }
}
