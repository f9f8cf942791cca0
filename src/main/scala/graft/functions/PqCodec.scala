package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the product-quantization codec.
  *
  * The PQ encode pass is the one unavoidable linear-in-n stage of the
  * IVFADC family: every corpus vector must find, per subspace, its nearest
  * of `pqk` codewords. Expressed relationally (components ⋈ codebook on
  * dimension → groupBy argmin) that is an n × Dim × pqk row explosion
  * through a hash aggregate — 8.2 BILLION shuffle rows at the 2M-vector
  * decade with the 64-codeword ladder rung. But the whole computation is
  * per-row: PqM × pqk × (Dim/PqM) primitive long ops against a codebook
  * that is control-plane sized (pqk × Dim ≤ 16k longs even at the k=256
  * rung). So it compiles to a tight loop inside whole-stage codegen, the
  * same pattern as [[QuantizedVec.QuantizedDot]], with the codebook held
  * as a reference object in the generated class.
  *
  * Bit-equivalence with the relational formulation (which the DuckDB
  * oracle still replays): quantization is the identical
  * `floor(x·scale + 0.5)`, distances are exact long arithmetic, the
  * argmin keeps the LOWEST codeword id on ties (`<`, not `<=` — matching
  * `min(struct(dist2, c))`), and dimensions beyond the array's length are
  * skipped exactly as the component join's inner semantics skip them.
  */
object PqCodec {

  private def quantize(x: Double, scale: Double): Long =
    math.floor(x * scale + 0.5).toLong

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private def elemAsDouble(a: ArrayData, et: DataType, i: Int): Double = et match {
    case FloatType => a.getFloat(i).toDouble
    case DoubleType => a.getDouble(i)
    case _ => throw new IllegalArgumentException(s"unsupported element type $et")
  }

  /** argmin codes per subspace: array<long> of length PqM = codebook.length.
    * `codebook(m)(c)(j)` is the already-quantized codeword component. */
  case class PqEncode(child: Expression, codebook: Array[Array[Array[Long]]],
      scale: Double) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    // The synthesized case-class equals compares the array field by
    // REFERENCE, so two structurally identical encodes never compare
    // equal — defeating Catalyst common-subexpression elimination /
    // canonicalization. Compare the codebook by value.
    override def equals(other: Any): Boolean = other match {
      case PqEncode(c, cb, s) => c == child && s == scale &&
        java.util.Arrays.deepEquals(
          cb.asInstanceOf[Array[AnyRef]], codebook.asInstanceOf[Array[AnyRef]])
      case _ => false
    }
    override def hashCode(): Int = 31 * (31 * child.hashCode +
      java.util.Arrays.deepHashCode(codebook.asInstanceOf[Array[AnyRef]])) + scale.##

    override def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      val et = elemType(child)
      val n = a.numElements()
      val pqm = codebook.length
      val codes = new Array[Long](pqm)
      var m = 0
      while (m < pqm) {
        val sub = codebook(m)(0).length
        var best = Long.MaxValue
        var bc = 0L
        var c = 0
        while (c < codebook(m).length) {
          var s = 0L
          var j = 0
          while (j < sub) {
            val idx = m * sub + j
            if (idx < n) {
              val diff = quantize(elemAsDouble(a, et, idx), scale) - codebook(m)(c)(j)
              s += diff * diff
            }
            j += 1
          }
          if (s < best) { best = s; bc = c.toLong }
          c += 1
        }
        codes(m) = bc
        m += 1
      }
      new GenericArrayData(codes)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, arr => {
        val cb = ctx.addReferenceObj("pqcb", codebook, "long[][][]")
        val i = ctx.freshName("i")
        val get = CodeGenerator.getValue(arr, elemType(child), i)
        val codes = ctx.freshName("codes")
        val m = ctx.freshName("m")
        val c = ctx.freshName("c")
        val j = ctx.freshName("j")
        val s = ctx.freshName("s")
        val best = ctx.freshName("best")
        val bc = ctx.freshName("bc")
        val sub = ctx.freshName("sub")
        val n = ctx.freshName("n")
        s"""
           |int $n = $arr.numElements();
           |long[] $codes = new long[$cb.length];
           |for (int $m = 0; $m < $cb.length; $m++) {
           |  int $sub = $cb[$m][0].length;
           |  long $best = Long.MAX_VALUE; long $bc = 0L;
           |  for (int $c = 0; $c < $cb[$m].length; $c++) {
           |    long $s = 0L;
           |    for (int $j = 0; $j < $sub; $j++) {
           |      int $i = $m * $sub + $j;
           |      if ($i < $n) {
           |        long __q = (long) java.lang.Math.floor(((double) $get) * $scale + 0.5);
           |        long __df = __q - $cb[$m][$c][$j];
           |        $s += __df * __df;
           |      }
           |    }
           |    if ($s < $best) { $best = $s; $bc = (long) $c; }
           |  }
           |  $codes[$m] = $bc;
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Full ADC lookup table for a PROBE vector: array<long> of length
    * PqM × pqk, entry m·pqk + c = quantized L2 between the probe's m-th
    * subvector and codeword c. Runs only on the ~200-row probe batch. */
  case class PqDistTable(child: Expression, codebook: Array[Array[Array[Long]]],
      scale: Double) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    // Value equality over the array field — see [[PqEncode.equals]].
    override def equals(other: Any): Boolean = other match {
      case PqDistTable(c, cb, s) => c == child && s == scale &&
        java.util.Arrays.deepEquals(
          cb.asInstanceOf[Array[AnyRef]], codebook.asInstanceOf[Array[AnyRef]])
      case _ => false
    }
    override def hashCode(): Int = 31 * (31 * child.hashCode +
      java.util.Arrays.deepHashCode(codebook.asInstanceOf[Array[AnyRef]])) + scale.##

    override def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      val et = elemType(child)
      val n = a.numElements()
      val pqm = codebook.length
      val pqk = codebook(0).length
      val out = new Array[Long](pqm * pqk)
      var m = 0
      while (m < pqm) {
        val sub = codebook(m)(0).length
        var c = 0
        while (c < pqk) {
          var s = 0L
          var j = 0
          while (j < sub) {
            val idx = m * sub + j
            if (idx < n) {
              val diff = quantize(elemAsDouble(a, et, idx), scale) - codebook(m)(c)(j)
              s += diff * diff
            }
            j += 1
          }
          out(m * pqk + c) = s
          c += 1
        }
        m += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, arr => {
        val cb = ctx.addReferenceObj("pqcb", codebook, "long[][][]")
        val i = ctx.freshName("i")
        val get = CodeGenerator.getValue(arr, elemType(child), i)
        val out = ctx.freshName("out")
        val m = ctx.freshName("m")
        val c = ctx.freshName("c")
        val j = ctx.freshName("j")
        val s = ctx.freshName("s")
        val sub = ctx.freshName("sub")
        val n = ctx.freshName("n")
        val pqk = ctx.freshName("pqk")
        s"""
           |int $n = $arr.numElements();
           |int $pqk = $cb[0].length;
           |long[] $out = new long[$cb.length * $pqk];
           |for (int $m = 0; $m < $cb.length; $m++) {
           |  int $sub = $cb[$m][0].length;
           |  for (int $c = 0; $c < $pqk; $c++) {
           |    long $s = 0L;
           |    for (int $j = 0; $j < $sub; $j++) {
           |      int $i = $m * $sub + $j;
           |      if ($i < $n) {
           |        long __q = (long) java.lang.Math.floor(((double) $get) * $scale + 0.5);
           |        long __df = __q - $cb[$m][$c][$j];
           |        $s += __df * __df;
           |      }
           |    }
           |    $out[$m * $pqk + $c] = $s;
           |  }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  def pqEncode(emb: Column, codebook: Array[Array[Array[Long]]],
      scale: Double = QuantizedVec.DefaultScale): Column =
    ColumnShim.column(PqEncode(ColumnShim.expression(emb), codebook, scale))

  def pqDistTable(emb: Column, codebook: Array[Array[Array[Long]]],
      scale: Double = QuantizedVec.DefaultScale): Column =
    ColumnShim.column(PqDistTable(ColumnShim.expression(emb), codebook, scale))
}
