package graft

import graft.functions.HllSketch
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Pins [[HllSketch]] beyond the oracle row: the register state is a
  * deterministic function of the input SET (partition count, duplication,
  * and merge order cannot move it), the raw estimate lands inside the
  * standard HLL error envelope once cardinality ≫ m, and the identical
  * aggregate runs as a Structured Streaming aggregation with 256-byte
  * per-group state. */
class HllSketchSpec extends SparkTestBase {
  import spark.implicits._

  private def sketch(df: org.apache.spark.sql.DataFrame): (Long, Long, Long) = {
    val r = df.agg(HllSketch.hllDistinct(col("v")).as("h"))
      .select(col("h.s"), col("h.zero_regs"), col("h.raw_millis")).head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("partition count, row order, and duplication cannot move the sketch") {
    val vals = (1 to 5000).map(i => s"val_$i")
    val base = sketch(vals.toDF("v"))
    assert(base == sketch(vals.reverse.toDF("v").repartition(17)))
    assert(base == sketch((vals ++ vals ++ vals.take(123)).toDF("v").repartition(3)))
    assert(base == sketch(vals.toDF("v").repartition(1)))
  }

  test("raw estimate is inside the HLL error envelope for n >> m") {
    // standard error for m=256 is 1.04/sqrt(256) = 6.5%; allow 4 sigma
    Seq(2000, 10000, 50000).foreach { n =>
      val (_, zeros, raw) = sketch((1 to n).map(i => s"u$i").toDF("v"))
      // E[empty registers] = 256·e^(−n/256): ~0.1 at n=2000, ~0 beyond
      assert(zeros <= (if (n >= 10000) 0 else 4), s"n=$n zero_regs=$zeros")
      val est = raw / 1000.0
      assert(math.abs(est - n) / n < 0.26, s"n=$n est=$est")
    }
  }

  test("tiny inputs: registers and S are exactly the hand-computed state") {
    // empty input: all registers zero -> S = 256 * 2^53, V = 256
    val (s0, z0, _) = sketch(Seq.empty[String].toDF("v"))
    assert(s0 == 256L * (1L << 53) && z0 == 256L)
    // one value: exactly one register moves, S drops accordingly
    val (s1, z1, _) = sketch(Seq("x").toDF("v"))
    assert(z1 == 255L && s1 < s0 && (s0 - s1) % 1 == 0)
  }

  test("the same aggregate runs as a streaming aggregation") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val q = input.toDF().toDF("source", "v")
      .groupBy(col("source"))
      .agg(HllSketch.hllDistinct(col("v")).as("h"))
      .select(col("source"), col("h.s").as("s"), col("h.raw_millis").as("raw_millis"))
      .writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("graft_hll_stream").start()
    try {
      input.addData((1 to 400).map(i => ("a", s"v$i")) ++ (1 to 70).map(i => ("b", s"w$i")): _*)
      q.processAllAvailable()
      input.addData((201 to 600).map(i => ("a", s"v$i")): _*) // 200 overlap
      q.processAllAvailable()
      val out = spark.table("graft_hll_stream")
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      // streamed state equals the batch sketch over the union of batches
      val batchA = sketch((1 to 600).map(i => s"v$i").toDF("v"))
      val batchB = sketch((1 to 70).map(i => s"w$i").toDF("v"))
      assert(out("a") == ((batchA._1, batchA._3)))
      assert(out("b") == ((batchB._1, batchB._3)))
    } finally q.stop()
  }
}
