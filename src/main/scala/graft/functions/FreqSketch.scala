package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items ("heavy hitters") summary as a native
  * Catalyst `TypedImperativeAggregate`.
  *
  * The scale problem: an exact `GROUP BY term` over a tokenized 100 TB
  * corpus shuffles every token occurrence. The MG summary holds at most `k`
  * (item, count) pairs per partial aggregate — map-side partials merge by
  * count-addition followed by a subtract-the-(k+1)-th-largest compaction
  * (Agarwal et al., "Mergeable summaries", PODS 2012), so one fixed-size
  * state crosses the shuffle per partition, O(k) bytes total.
  *
  * Guarantee (Misra & Gries 1982): every item with true frequency
  * > n/(k+1) of n total rows survives in the summary — the summary is a
  * SUPERSET of the heavy hitters, never missing one. The summary's counts
  * are merge-order-dependent (unusable under a hash-comparing oracle), so
  * the engine treats the sketch strictly as a CANDIDATE GENERATOR: callers
  * re-count the ≤ k candidates exactly (a join that shuffles only
  * candidate-matching rows) and threshold on the exact counts — making the
  * final answer the exact heavy-hitter set, deterministic by construction,
  * while the full-corpus shuffle never happens.
  */
object FreqSketch {

  case class MgCandidates(
      child: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[String, java.lang.Long]]
    with UnaryLike[Expression] {

    require(k >= 1, s"mg_candidates needs k >= 1, got $k")

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"mg_candidates expects a STRING input, got ${child.dataType.catalogString}")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = false
    override def prettyName: String = "mg_candidates"

    type Buf = java.util.HashMap[String, java.lang.Long]

    override def createAggregationBuffer(): Buf = new java.util.HashMap[String, java.lang.Long]()

    /** Subtract the (k+1)-th largest count from every entry and drop the
      * non-positive ones — the mergeable-summaries compaction. Leaves at
      * most k entries and preserves the n/(k+1) superset guarantee. */
    private def compact(b: Buf): Buf = {
      if (b.size > k) {
        val counts = new Array[Long](b.size)
        var i = 0
        val it0 = b.values().iterator()
        while (it0.hasNext) { counts(i) = it0.next(); i += 1 }
        java.util.Arrays.sort(counts)
        val sub = counts(b.size - 1 - k) // (k+1)-th largest
        val it = b.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val nv = e.getValue - sub
          if (nv <= 0) it.remove() else e.setValue(nv)
        }
      }
      b
    }

    override def update(b: Buf, input: InternalRow): Buf = {
      val v = child.eval(input)
      if (v != null) {
        val s = v.asInstanceOf[UTF8String].toString
        val cur = b.get(s)
        if (cur != null) b.put(s, cur + 1L)
        else if (b.size < k) b.put(s, 1L)
        else {
          // classic MG decrement step: all counters -1, drop zeros
          val it = b.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
          }
        }
      }
      b
    }

    override def merge(b: Buf, other: Buf): Buf = {
      other.forEach { (key, cnt) =>
        val cur = b.get(key)
        b.put(key, if (cur == null) cnt else cur + cnt)
      }
      compact(b)
    }

    /** Candidate item set, sorted for stable output. */
    override def eval(b: Buf): Any = {
      val keys = new Array[String](b.size)
      b.keySet().toArray(keys)
      java.util.Arrays.sort(keys, java.util.Comparator.naturalOrder[String]())
      new GenericArrayData(keys.map(UTF8String.fromString(_).asInstanceOf[Any]))
    }

    override def serialize(b: Buf): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.writeInt(b.size)
      b.forEach { (key, cnt) =>
        val bytes = key.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        out.writeInt(bytes.length); out.write(bytes); out.writeLong(cnt)
      }
      out.flush()
      bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): Buf = {
      val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
      val n = in.readInt()
      val b = createAggregationBuffer()
      var i = 0
      while (i < n) {
        val len = in.readInt()
        val kb = new Array[Byte](len)
        in.readFully(kb)
        b.put(new String(kb, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
        i += 1
      }
      b
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): MgCandidates =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): MgCandidates =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(newChild: Expression): MgCandidates =
      copy(child = newChild)
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column API: sorted array of heavy-hitter CANDIDATES — a guaranteed
    * superset of items with frequency > n/(k+1); re-count candidates
    * exactly to get a deterministic final answer. */
  def mgCandidates(c: Column, k: Int): Column =
    ColumnShim.column(MgCandidates(ColumnShim.expression(c), k).toAggregateExpression())
}
