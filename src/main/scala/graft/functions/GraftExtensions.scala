package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** Session extension registering graft's native expressions as SQL
  * functions — enable with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`.
  * The library's Scala surface (graft.sim.Similarity) picks these up
  * automatically via `call_function` when present and falls back to the
  * portable higher-order-function formulation otherwise.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[CosineSimilarity].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "graft_cosine(a, b) - cosine similarity of two numeric arrays in double precision"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - dot product of two numeric arrays in double precision"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      info("graft_minhash", "graft_minhash(tokens, k, numHashes) - MinHash signature of the k-token shingle set"),
      (children: Seq[Expression]) => ShingleMinHash(children(0),
        intLit(children(1), "k"), intLit(children(2), "numHashes"))))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      info("graft_simhash", "graft_simhash(tokens) - 63-bit SimHash of the token array"),
      (children: Seq[Expression]) => SimHash63(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_shingles"),
      info("graft_shingles", "graft_shingles(tokens, k) - distinct space-joined k-token shingles"),
      (children: Seq[Expression]) => TokenShingles(children(0), intLit(children(1), "k"))))
    ext.injectFunction((
      FunctionIdentifier("graft_best_cosine"),
      info("graft_best_cosine",
        "graft_best_cosine(vec, evalVecs, evalIds) - struct(c, e): max cosine against the literal eval matrix, ties to the larger id"),
      (children: Seq[Expression]) => BestCosineMatch(children(0), children(1),
        children(2))))
    ext.injectFunction((
      FunctionIdentifier("graft_topk_by"),
      info("graft_topk_by",
        "graft_topk_by(payload, ord, tie, k) - array of the k payloads with highest ord (ties: lowest tie), best-first"),
      (children: Seq[Expression]) => TopKBy(children(0), children(1), children(2),
        intLit(children(3), "k"))))
  }

  private def intLit(e: Expression, name: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }
}

/** Runtime probe for the native expressions: true when the active
  * session was built with
  * `spark.sql.extensions=graft.functions.GraftExtensions`. The Scala
  * API (Dedup, Shingles, Similarity) dispatches to the codegen'd
  * expressions when present and to the portable HOF forms otherwise —
  * identical values either way (asserted by the specs).
  */
object GraftNative {
  def enabled: Boolean =
    try org.apache.spark.sql.SparkSession.active.catalog
      .functionExists("graft_minhash")
    catch { case _: Exception => false }
}
