package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sim.Similarity

class VectorExpressionsSpec extends SparkSpec {

  test("native graft_cosine/graft_dot registered and value-identical to HOF forms") {
    import spark.implicits._
    assert(spark.catalog.functionExists("graft_cosine"))
    assert(spark.catalog.functionExists("graft_dot"))

    val rnd = new Random(7)
    val rows = (0 until 50).map { _ =>
      (Seq.fill(16)(rnd.nextFloat() * 2 - 1), Seq.fill(16)(rnd.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("a", "b")
    val out = df.select(
      call_function("graft_cosine", $"a", $"b").as("native_cos"),
      Similarity.cosine($"a", $"b").as("hof_cos"),
      call_function("graft_dot", $"a", $"b").as("native_dot"),
      Similarity.dot($"a", $"b").as("hof_dot"))
      .as[(Double, Double, Double, Double)].collect()
    out.foreach { case (nc, hc, nd, hd) =>
      assert(nc === hc) // bit-identical: same fold order, same double math
      assert(nd === hd)
    }
  }

  test("zero vectors, double arrays, and SQL surface") {
    import spark.implicits._
    val z = Seq((Seq(0.0f, 0.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
      .select(call_function("graft_cosine", $"a", $"b").as("c"))
      .as[Double].collect()(0)
    assert(z === 0.0)

    val d = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
      .select(call_function("graft_dot", $"a", $"b").as("d"))
      .as[Double].collect()(0)
    assert(d === 11.0)

    Seq((Seq(1.0f, 0.0f), Seq(1.0f, 0.0f))).toDF("a", "b")
      .createOrReplaceTempView("vec_pairs")
    val viaSql = spark.sql("SELECT graft_cosine(a, b) AS c FROM vec_pairs")
      .as[Double].collect()(0)
    assert(math.abs(viaSql - 1.0) < 1e-12)

    // null input array → null out (BinaryExpression null semantics)
    val n = Seq((Option.empty[Seq[Float]], Some(Seq(1.0f)))).toDF("a", "b")
      .selectExpr("graft_cosine(a, b) AS c")
      .collect()(0)
    assert(n.isNullAt(0))
  }

  test("codegen path is exercised (no interpreter fallback errors) on a wide scan") {
    import spark.implicits._
    val rnd = new Random(11)
    val big = (0 until 2000).map(i => (i.toLong, Seq.fill(64)(rnd.nextFloat()))).toDF("id", "v")
    // self-join-free aggregate over the native expression forces
    // whole-stage codegen compilation of the loop
    val s = big.select(sum(call_function("graft_cosine", $"v", $"v")).as("s"))
      .as[Double].collect()(0)
    assert(math.abs(s - 2000.0) < 1e-6) // cosine(v,v)=1 for non-zero v
  }
}
