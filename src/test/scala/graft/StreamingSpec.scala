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

  test("deployed streaming classifier == batch classifier confusion") {
    // the literal-array scorer on the stream must reproduce the batch
    // broadcast-join apply bit-for-bit (integer adds commute); both are
    // gated by the same oracle row, this pins them against each other
    val batch = SparkEntry.queries("pipeline_quality_classifier")(spark, Sf)
      .collect().map(_.toSeq).toSet
    CacheScope.releaseAll()
    val stream = SparkEntry.queries("stream_quality_classifier")(spark, Sf)
      .collect().map(_.toSeq).toSet
    assert(stream == batch && stream.nonEmpty)
  }

  test("streaming semantic drift == batch drift diff minus unseen deletes") {
    // the consumer scores ARRIVING rows statelessly (per-row quantized
    // arrays + codegen cosine) where the batch fuses a component join —
    // same integers, same doubles, so on the arrival-visible subset
    // (everything but DELETED, which a tombstone-less feed cannot see)
    // the two must be bit-identical
    val batch = SparkEntry.queries("diff_semantic_drift")(spark, Sf)
      .filter(col("status") =!= graft.operators.SnapshotDiff.Deleted)
      .collect().map(_.toSeq).toSet
    CacheScope.releaseAll()
    val stream = SparkEntry.queries("stream_semantic_drift")(spark, Sf)
      .collect().map(_.toSeq).toSet
    assert(stream == batch && stream.nonEmpty)
    CacheScope.releaseAll()
  }

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

  test("streaming CMS counters == batch CMS sketch over the same corpus") {
    // the Count-Min build is ONE hash aggregation, so the identical plan
    // runs as a streaming state-store aggregation: counters fold
    // associatively/commutatively across micro-batches, and the final
    // complete-mode table must equal the batch sketch bit-for-bit
    val docs = Tables.load(spark, Sf, "documents")
    val toks = docs.select(explode(graft.functions.Hashing.tokens(col("text"))).as("term"))
    val batch = graft.operators.SketchQueries.cmsSketch(toks)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet

    val dir = java.nio.file.Files.createTempDirectory("graft_cms_in")
    docs.write.mode("overwrite").parquet(dir.toString)
    val stream = spark.readStream.schema(docs.schema).parquet(dir.toString)
      .select(explode(graft.functions.Hashing.tokens(col("text"))).as("term"))
    val q = graft.operators.SketchQueries.cmsSketch(stream)
      .writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("graft_cms_stream").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("graft_cms_stream")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("stream-static seasonal anomaly == batch scorer over the same input") {
    val batchEvents = Tables.load(spark, Sf, "events")
    val baseline = graft.operators.EventsQueries.seasonalBaseline(batchEvents).persist()
    val threshold = 50000000L // 50 value units in micro-units
    // the same stateless scorer executed as a plain batch query...
    val batch = EventStreams.seasonalAnomaly(batchEvents, baseline, threshold)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    // ...must equal its STREAMING execution over the same rows
    val dir = java.nio.file.Files.createTempDirectory("graft_anom_in")
    batchEvents.write.mode("overwrite").parquet(dir.toString)
    val streamed = EventStreams.runSeasonalAnomalyOnce(spark, dir.toString,
        batchEvents.schema, baseline, threshold)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(streamed == batch && batch.nonEmpty)
    baseline.unpersist()
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

  test("watermark drops late data: a row below the watermark never lands in its window") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Double)]
    val df = input.toDS().toDF("ts_us", "event_type", "value")
      .select(timestamp_micros(col("ts_us")).as("ts"), col("event_type"), col("value"))
    val q = EventStreams.tumblingCounts(df)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("graft_late").start()
    val base = 1700000100L * 1000000L // epoch micros, aligned to the 5-min grid
    def at(min: Long) = base + min * 60L * 1000000L
    try {
      // batch 1: three on-time events in the first 5-min window, plus one
      // far-future event that advances the watermark to +50 min
      input.addData((at(0), "click", 1.0), (at(1), "click", 1.0),
        (at(2), "click", 1.0), (at(60), "click", 1.0))
      q.processAllAvailable()
      // batch 2: one LATE event for the first window (watermark is now far
      // past it) plus a nudge that keeps the stream moving
      input.addData((at(1), "click", 1.0), (at(61), "click", 1.0))
      q.processAllAvailable()
      input.addData((at(90), "click", 1.0))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("graft_late")
      .select("bucket_start", "n_events").collect()
      .map(r => r.getTimestamp(0).getTime -> r.getLong(1)).toMap
    val firstWindow = rows.keys.min
    // the late row was dropped: the first finalized window counts 3, not 4
    assert(rows(firstWindow) == 3L, rows.toString)
    assert(!rows.valuesIterator.contains(4L), rows.toString)
  }

  test("streaming CEP pattern match emits exactly the batch clean-conversion set") {
    // batch truth: users counted by the oracle-checked events_pattern_match
    val e = Tables.load(spark, Sf, "events")
    val su = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_signup"))
    val er = e.filter(col("event_type") === "error")
      .join(su, "user_id").filter(col("ts") > col("t_signup"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_err"))
    val batchClean = e.filter(col("event_type") === "purchase")
      .join(su.join(er, Seq("user_id"), "left_outer"), "user_id")
      .filter(col("ts") > col("t_signup") &&
        (col("t_err").isNull || col("ts") < col("t_err")))
      .select("user_id").distinct().as[Long].collect().toSet

    val evs = e.select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"))
      .as[EventStreams.PEv].collect().sortBy(v => (v.ts_us, v.user_id))
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.PEv]
    val q = EventStreams.patternMatch(input.toDS())
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("graft_cep").start()
    val (first, second) = evs.splitAt(evs.length / 2)
    input.addData(first.toIndexedSeq)
    q.processAllAvailable()
    input.addData(second.toIndexedSeq)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("graft_cep").as[Long].collect()
    assert(streamed.length == streamed.distinct.length) // emit-once per user
    assert(streamed.toSet == batchClean && batchClean.nonEmpty)
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

  test("streaming bottom-k sample quantiles converge to the batch sketch exactly") {
    val k = 64
    val batchEvents = Tables.load(spark, Sf, "events")
    val batch = EventStreams.sampleQuantiles(batchEvents, k)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSet

    // feed the events in three chunks: the O(k) sketch state folds each
    // micro-batch into the standing sample; determinism makes the final
    // table independent of the chunking
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Double)]
    val df = input.toDS().toDF("event_id", "event_type", "value")
    val q = EventStreams.sampleQuantiles(df, k)
      .writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("graft_samp").start()
    val rows = batchEvents.select("event_id", "event_type", "value")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    try {
      rows.grouped(math.max(1, rows.length / 3)).foreach { chunk =>
        input.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.table("graft_samp")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSet
    assert(streamed == batch && batch.nonEmpty)
  }
}
