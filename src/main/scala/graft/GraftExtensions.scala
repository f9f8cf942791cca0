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
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("qdot"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[QuantizedVec.QuantizedDot].getName, "qdot"),
        (args: Seq[Expression]) =>
          QuantizedVec.QuantizedDot(args.head, args(1), QuantizedVec.DefaultScale)))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("qnormsq"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[QuantizedVec.QuantizedNormSq].getName, "qnormsq"),
        (args: Seq[Expression]) =>
          QuantizedVec.QuantizedNormSq(args.head, QuantizedVec.DefaultScale)))
  }
}
