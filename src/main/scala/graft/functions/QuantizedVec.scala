package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding-vector arithmetic.
  *
  * Cosine similarity over `array<float>` embeddings is the hot inner loop of
  * the similarity/near-dup operators — at 100 TB it runs billions of times,
  * so it is implemented as a codegen'd Catalyst `Expression` (a tight
  * primitive `long` loop inside whole-stage codegen) rather than a Scala UDF
  * (boxing + serialization) or a higher-order-function chain (per-element
  * lambda dispatch).
  *
  * Values are quantized to integers — `floor(x * scale + 0.5)` — and
  * accumulated in exact `long` arithmetic. This makes every similarity score
  * a deterministic function of the inputs regardless of summation order,
  * partitioning, or SIMD strategy, which is what lets the DuckDB oracle
  * reproduce the engine's results bit-for-bit (floating-point dot products
  * are order-dependent; integer ones are not). `floor(x+0.5)` is used
  * explicitly because Java's, Spark's and DuckDB's `round` disagree on ties.
  */
object QuantizedVec {
  val DefaultScale: Double = 1e6

  private def quantize(x: Double, scale: Double): Long =
    math.floor(x * scale + 0.5).toLong

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private def elemAsDouble(a: ArrayData, et: DataType, i: Int): Double = et match {
    case FloatType => a.getFloat(i).toDouble
    case DoubleType => a.getDouble(i)
    case _ => throw new IllegalArgumentException(s"unsupported element type $et")
  }

  /** Σ q(a_i)·q(b_i) over the common prefix of two numeric arrays. */
  case class QuantizedDot(left: Expression, right: Expression, scale: Double)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val (etL, etR) = (elemType(left), elemType(right))
      val n = math.min(a.numElements(), b.numElements())
      var s = 0L
      var i = 0
      while (i < n) {
        s += quantize(elemAsDouble(a, etL, i), scale) *
          quantize(elemAsDouble(b, etR, i), scale)
        i += 1
      }
      s
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (arr1, arr2) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        val getL = CodeGenerator.getValue(arr1, elemType(left), i)
        val getR = CodeGenerator.getValue(arr2, elemType(right), i)
        s"""
           |int $n = java.lang.Math.min($arr1.numElements(), $arr2.numElements());
           |long $s = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  long ql = (long) java.lang.Math.floor(((double) $getL) * $scale + 0.5);
           |  long qr = (long) java.lang.Math.floor(((double) $getR) * $scale + 0.5);
           |  $s += ql * qr;
           |}
           |${ev.value} = $s;
         """.stripMargin
      })
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Σ q(v_i)² — the quantized squared L2 norm. */
  case class QuantizedNormSq(child: Expression, scale: Double) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      val et = elemType(child)
      var s = 0L
      var i = 0
      while (i < a.numElements()) {
        val q = quantize(elemAsDouble(a, et, i), scale)
        s += q * q
        i += 1
      }
      s
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, arr => {
        // fall back to a method call — loop body shared with nullSafeEval
        s"graft.functions.QuantizedVec.normSq($arr, ${elemType(child) == FloatType}, $scale)"
      })
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Codegen helper for [[QuantizedNormSq]]. */
  def normSq(a: ArrayData, isFloat: Boolean, scale: Double): Long = {
    var s = 0L
    var i = 0
    while (i < a.numElements()) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val q = quantize(x, scale)
      s += q * q
      i += 1
    }
    s
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column API: quantized dot product of two vector columns. */
  def qdot(a: Column, b: Column, scale: Double = DefaultScale): Column =
    ColumnShim.column(QuantizedDot(ColumnShim.expression(a),
      ColumnShim.expression(b), scale))

  /** Column API: quantized squared norm of a vector column. */
  def qnormsq(v: Column, scale: Double = DefaultScale): Column =
    ColumnShim.column(QuantizedNormSq(ColumnShim.expression(v), scale))

  /** Cosine similarity from quantized integer dot/norms (deterministic). */
  def qcosine(a: Column, b: Column, normSqA: Column, normSqB: Column): Column = {
    import org.apache.spark.sql.functions._
    qdot(a, b).cast("double") / (sqrt(normSqA.cast("double")) * sqrt(normSqB.cast("double")))
  }

  /** DuckDB SQL for the quantized value of one element (oracle parity). */
  def quantizeSql(e: String, scale: Double = DefaultScale): String =
    s"CAST(floor($e * $scale + 0.5) AS BIGINT)"
}
