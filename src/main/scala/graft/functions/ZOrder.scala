package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Z-order (Morton) curve value as a codegen'd Catalyst expression.
  *
  * Data-layout primitive for multi-dimensional clustering: sorting or
  * range-partitioning a table by the interleaved bits of two dimension keys
  * places rows that are close in BOTH dimensions into the same files, so
  * min/max footer statistics prune scans for predicates on EITHER dimension
  * — the standard lakehouse layout technique for 100 TB tables where only
  * one physical sort order exists. The expression is the cheap inner piece:
  * a branch-free bit interleave inside whole-stage codegen, usable in
  * `repartitionByRange(zorder2(x, y))` + sortWithinPartitions writes.
  *
  * Bit interleaving is exact integer arithmetic, so the DuckDB oracle
  * reproduces it with shift/mask terms ([[ZOrder.interleaveSql]]).
  */
object ZOrder {

  /** Interleave the low `bits` bits: x in even positions, y in odd. */
  def interleave(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= (((x >>> i) & 1L) << (2 * i)) | (((y >>> i) & 1L) << (2 * i + 1))
      i += 1
    }
    z
  }

  case class ZOrder2(left: Expression, right: Expression, bits: Int)
      extends BinaryExpression {
    require(bits >= 1 && bits <= 31, s"zorder2 bits must be in [1,31], got $bits")

    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType == LongType && right.dataType == LongType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"zorder2 expects (BIGINT, BIGINT), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    override def dataType: DataType = LongType
    override def prettyName: String = "zorder2"

    override def nullSafeEval(l: Any, r: Any): Any =
      interleave(l.asInstanceOf[Long], r.asInstanceOf[Long], bits)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (x, y) => s"graft.functions.ZOrder.interleave($x, $y, $bits)")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column API: Morton value of two LONG dimension keys. */
  def zorder2(x: Column, y: Column, bits: Int = 16): Column =
    ColumnShim.column(ZOrder2(ColumnShim.expression(x), ColumnShim.expression(y), bits))

  /** DuckDB SQL for the same interleave: disjoint shift/mask terms summed. */
  def interleaveSql(x: String, y: String, bits: Int): String =
    (0 until bits).map(i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})")
      .mkString(" + ")
}
