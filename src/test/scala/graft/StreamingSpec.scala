package graft

import graft.operators.EventsQueries
import graft.streaming.EventStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Structured Streaming pipelines agree with their oracle-checked batch
  * equivalents. */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  test("streaming tumbling counts == batch tumbling counts") {
    val batchEvents = Tables.load(spark, Sf, "events")
    val batch = EventsQueries.queries("events_tumbling")(spark, Sf)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    // stream source needs a directory; stage the micros-normalized events
    // (nanos handling itself is covered by Tables.load + the batch oracle)
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_in")
    batchEvents.write.mode("overwrite").parquet(dir.toString)
    val streamed = EventStreams.runTumblingOnce(spark, dir.toString, batchEvents.schema)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch)
  }

  test("stream-stream interval join == oracle-checked batch interval join") {
    val batchEvents = Tables.load(spark, Sf, "events")
    val batch = EventsQueries.queries("events_interval_join")(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val dir = java.nio.file.Files.createTempDirectory("graft_ssj_in")
    batchEvents.write.mode("overwrite").parquet(dir.toString)
    val streamed = EventStreams
      .runClickViewJoinOnce(spark, dir.toString, batchEvents.schema)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("stateful streaming sessionization == batch sessionization") {
    val batch = EventsQueries.queries("events_sessionize")(spark, Sf)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id")) ->
        r.getAs[Long]("session_id")).toMap

    val evs = Tables.load(spark, Sf, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .as[EventStreams.Ev].collect().sortBy(e => (e.ts_us, e.event_id))

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Ev]
    val q = EventStreams.sessionize(input.toDS())
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("graft_sessions").start()
    // feed in two event-time-ordered micro-batches to exercise state carry
    val (first, second) = evs.splitAt(evs.length / 2)
    input.addData(first.toIndexedSeq)
    q.processAllAvailable()
    input.addData(second.toIndexedSeq)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("graft_sessions").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id")) ->
        r.getAs[Long]("session_id")).toMap
    assert(streamed == batch)
  }
}
