package graft

import graft.expressions.{CosineSimilarity, DotProduct}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions: registers the engine's codegen expressions as
  * SQL functions, so `spark.sql("SELECT cosine_similarity(a, b)")`
  * works the same as the Column API (`VectorFns.cosine`). Install via
  * `SparkSession.builder.withExtensions(new GraftExtensions)` (done by
  * `Engine.session`) or `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        FunctionIdentifier("cosine_similarity"),
        info(
          "cosine_similarity",
          "cosine_similarity(a, b) - cosine similarity of two array<double> vectors"),
        (args: Seq[Expression]) => {
          require(args.length == 2, "cosine_similarity takes 2 arguments")
          CosineSimilarity(args.head, args(1))
        }))
    ext.injectFunction(
      (
        FunctionIdentifier("dot_product"),
        info(
          "dot_product",
          "dot_product(a, b) - dot product of two array<double> vectors"),
        (args: Seq[Expression]) => {
          require(args.length == 2, "dot_product takes 2 arguments")
          DotProduct(args.head, args(1))
        }))
  }
}
