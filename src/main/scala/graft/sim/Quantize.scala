package graft.sim

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Symmetric per-vector int8 quantization for embedding columns — the
  * standard 4× storage/bandwidth cut for a 100 TB vector corpus (and
  * the representation IVF/LSH candidate scans prefer: int8 codes fit
  * 4× more vectors per cache line; exact float re-scoring happens only
  * on the short candidate list).
  *
  * Per-vector symmetric scheme: `scale = max(|x|) / 127`,
  * `code_i = floor(x_i / scale + 0.5)` (half-up, written as explicit
  * floor so any engine — including the DuckDB oracle — computes the
  * identical double expression; `round`'s half-rule differs across
  * engines), codes in [-127, 127], all-zero vectors get scale 0 and
  * zero codes. Everything is per-row Column math: no UDFs, no shuffle.
  *
  * HOF DISCIPLINE (see [[graft.text.Shingles]]): the scale is an
  * ARGUMENT to [[quantize]]/[[dequantize]], never recomputed inside the
  * lambda — a lambda-captured `array_max(...)` would re-evaluate once
  * per element, O(d²) per row. Materialize it once with
  * `.withColumn("scale", Quantize.quantScale($"vec"))` first.
  */
object Quantize {

  /** Per-vector quantization scale: `max(|x|) / 127` as double (0 for
    * empty or all-zero vectors).
    */
  def quantScale(vec: Column): Column =
    coalesce(array_max(transform(vec, x => abs(x))), lit(0f)).cast("double") / lit(127.0)

  /** Int8 codes for `vec` under a precomputed `scale` (pass an
    * attribute, not an expression — see the scaladoc above).
    */
  def quantize(vec: Column, scale: Column): Column =
    transform(vec, x =>
      when(scale > 0, floor(x.cast("double") / scale + lit(0.5)))
        .otherwise(lit(0L)).cast("tinyint"))

  /** Reconstruct approximate floats from codes: `code * scale`. */
  def dequantize(codes: Column, scale: Column): Column =
    transform(codes, c => c.cast("double") * scale)

  /** Worst absolute reconstruction error of a quantized vector —
    * bounded by `scale / 2` (+ float-cast noise); the audit column a
    * quantization pipeline reports.
    */
  def maxAbsError(vec: Column, codes: Column, scale: Column): Column =
    coalesce(array_max(zip_with(vec, codes,
      (x, c) => abs(x.cast("double") - c.cast("double") * scale))), lit(0.0))
}
