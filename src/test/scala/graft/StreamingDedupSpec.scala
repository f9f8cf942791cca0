package graft

import graft.streaming.StreamingDedup
import graft.streaming.StreamingDedup.{DedupEvent, Doc}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming exact-dedup: first arrival is canonical, re-crawls are marked
  * duplicates, and the fingerprint state survives across micro-batches. */
class StreamingDedupSpec extends SparkTestBase {
  import spark.implicits._

  test("duplicates are suppressed within and across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = StreamingDedup.dedupStream(input.toDS())
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("graft_dedup_stream").start()

    // batch 1: two distinct docs + an in-batch duplicate of the first
    input.addData(Seq(Doc(1, "alpha beta"), Doc(2, "gamma delta"), Doc(3, "alpha beta")))
    q.processAllAvailable()
    // batch 2: a cross-batch duplicate and a fresh doc
    input.addData(Seq(Doc(4, "alpha beta"), Doc(5, "epsilon zeta")))
    q.processAllAvailable()
    q.stop()

    val events = spark.table("graft_dedup_stream").as[DedupEvent].collect()
      .map(e => e.doc_id -> e).toMap
    assert(events.size == 5) // exactly one event per document
    assert(!events(1).is_dup && events(1).canonical_id == 1)
    assert(!events(2).is_dup && events(2).canonical_id == 2)
    assert(events(3).is_dup && events(3).canonical_id == 1)
    assert(events(4).is_dup && events(4).canonical_id == 1) // state crossed batches
    assert(!events(5).is_dup && events(5).canonical_id == 5)
  }
}
