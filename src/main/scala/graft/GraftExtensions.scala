package graft

import graft.functions.QuantizedVec
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression

/** `SparkSessionExtensions` installer: exposes the engine's custom Catalyst
  * expressions to SQL users.
  *
  * Usage: `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`; afterwards
  * `SELECT qdot(a.embedding, b.embedding)` and `qnormsq(embedding)` work in
  * plain SQL with full whole-stage codegen.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def requireArity(name: String, args: Seq[Expression], n: Int): Unit =
    if (args.length != n)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> name, "expectedNum" -> n.toString,
          "actualNum" -> args.length.toString, "docroot" -> ""))

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("qdot"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[QuantizedVec.QuantizedDot].getName, "qdot"),
        (args: Seq[Expression]) => {
          requireArity("qdot(arr, arr)", args, 2)
          QuantizedVec.QuantizedDot(args.head, args(1), QuantizedVec.DefaultScale)
        }))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("qnormsq"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[QuantizedVec.QuantizedNormSq].getName, "qnormsq"),
        (args: Seq[Expression]) => {
          requireArity("qnormsq(arr)", args, 1)
          QuantizedVec.QuantizedNormSq(args.head, QuantizedVec.DefaultScale)
        }))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("kmv_distinct"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[graft.functions.KmvSketch.KmvDistinct].getName, "kmv_distinct"),
        (args: Seq[Expression]) => {
          requireArity("kmv_distinct(str, k)", args, 2)
          val k = args(1) match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
            case other => throw new IllegalArgumentException(
              s"kmv_distinct: k must be an integer literal, got $other")
          }
          graft.functions.KmvSketch.KmvDistinct(args.head, k).toAggregateExpression()
        }))
  }
}
