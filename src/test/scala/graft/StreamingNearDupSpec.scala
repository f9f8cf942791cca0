package graft

import graft.operators.DedupQueries
import graft.streaming.StreamingNearDup
import graft.streaming.StreamingNearDup.{BandRow, CandPair}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming MinHash-LSH near-dedup: the stateless per-row signatures must
  * be lane-for-lane equal to the batch explode→groupBy aggregate, the
  * stateful bucket pairs must cross micro-batches, and the end-to-end run
  * must converge to the batch `dedup_minhash_lsh` table exactly. */
class StreamingNearDupSpec extends SparkTestBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("stateless array-expression signatures equal the batch aggregate lanes") {
    val docs = DedupQueries.corpus(spark, sfDir)
    val batch = DedupQueries.bands(
      DedupQueries.minhashSigs(DedupQueries.shingleHashes(docs)))
      .select(concat_ws("#", col("band"), col("bkey")).as("bucket"), col("doc_id"))
    val streamside = StreamingNearDup.statelessBands(docs)
    assert(streamside.except(batch).isEmpty && batch.except(streamside).isEmpty)
  }

  test("bucket state pairs arrivals within and across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[BandRow]
    val q = StreamingNearDup.candPairs(input.toDS())
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("graft_neardup_pairs").start()
    // batch 1: two docs share bucket x (in-batch pair), one alone in y
    input.addData(Seq(BandRow("x", 10L), BandRow("x", 7L), BandRow("y", 3L)))
    q.processAllAvailable()
    // batch 2: a late arrival in x pairs with BOTH prior occupants (state
    // crossed the batch boundary); a y arrival pairs with the singleton
    input.addData(Seq(BandRow("x", 5L), BandRow("y", 9L)))
    q.processAllAvailable()
    q.stop()
    val pairs = spark.table("graft_neardup_pairs").as[CandPair].collect().toSet
    assert(pairs == Set(CandPair(7, 10), CandPair(5, 10), CandPair(5, 7), CandPair(3, 9)))
  }

  test("end-to-end streaming run equals the batch dedup_minhash_lsh table") {
    val streamed = StreamingNearDup.runOnce(spark, sfDir)
    val batch = graft.SparkEntry.queries("dedup_minhash_lsh")(spark, sfDir)
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
    assert(streamed.count() > 0)
  }
}
