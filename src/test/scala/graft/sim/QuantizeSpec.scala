package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QuantizeSpec extends SparkSpec {

  private def frame(vecs: Seq[Float]*) = {
    import spark.implicits._
    vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "vec")
      .withColumn("scale", Quantize.quantScale(col("vec")))
      .withColumn("codes", Quantize.quantize(col("vec"), col("scale")))
  }

  test("codes are bounded, extremes hit ±127, zeros stay zero") {
    val rows = frame(
      Seq(1.0f, -1.0f, 0.5f, 0.0f),
      Seq(0.0f, 0.0f, 0.0f),
      Seq(-3.5f))
      .select(col("id"), col("scale"), col("codes")).orderBy("id").collect()
    assert(rows(0).getAs[Seq[Byte]]("codes") === Seq[Byte](127, -127, 64, 0))
    // all-zero vector: scale 0, all codes 0 (no division blowup)
    assert(rows(1).getAs[Double]("scale") === 0.0)
    assert(rows(1).getAs[Seq[Byte]]("codes") === Seq[Byte](0, 0, 0))
    // single negative element: |min| defines the scale, code -127
    assert(rows(2).getAs[Seq[Byte]]("codes") === Seq[Byte](-127))
  }

  test("dequantized reconstruction error is bounded by scale/2") {
    import spark.implicits._
    val vecs = (0 until 200).map { i =>
      (0 until 16).map(d => math.sin(i * 17 + d * 3).toFloat * (1 + i % 7))
    }
    val checked = frame(vecs: _*)
      .withColumn("err", Quantize.maxAbsError(col("vec"), col("codes"), col("scale")))
      .select(max(col("err") - col("scale") / 2).as("worst_slack"))
      .as[Double].head()
    assert(checked <= 1e-9, s"reconstruction error exceeded scale/2 by $checked")
  }

  test("quantize-dequantize round trip preserves argmax structure") {
    import spark.implicits._
    val df = frame(Seq(0.1f, 0.9f, -0.2f, 0.4f))
      .withColumn("deq", Quantize.dequantize(col("codes"), col("scale")))
    val (orig, deq) = df.select(col("vec"), col("deq"))
      .as[(Seq[Float], Seq[Double])].head()
    assert(orig.zipWithIndex.maxBy(_._1)._2 === deq.zipWithIndex.maxBy(_._1)._2)
  }
}
