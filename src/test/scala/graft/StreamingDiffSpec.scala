package graft

import graft.operators.SnapshotDiff
import graft.streaming.StreamingDiff
import graft.streaming.StreamingDiff.{DiffEvent, KeyedRow}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** The CDC streaming diff emits the same events as the batch diff over the
  * equivalent snapshot pair. */
class StreamingDiffSpec extends SparkTestBase {
  import spark.implicits._

  private val colNames = Seq("c1", "c2")

  test("changelog diff matches batch snapshot diff") {
    // snapshot 1 and snapshot 2 of a tiny table keyed by id
    val before = Seq((1, "a", "x"), (2, "b", "y"), (3, "c", "z")).toDF("id", "c1", "c2")
    val after = Seq((1, "a", "x"), (2, "B", "y"), (4, "d", "w")).toDF("id", "c1", "c2")

    val batch = SnapshotDiff.diff(before, after, Seq("id"))
      .collect()
      .map(r => (r.getAs[String]("__key"), r.getAs[String]("diff_status"),
        r.getAs[String]("modified_columns"), r.getAs[String]("side"))).toSet

    // the same change set as a changelog: initial load + updates + tombstone
    val batch1 = Seq(
      KeyedRow("1", Seq("a", "x"), tombstone = false),
      KeyedRow("2", Seq("b", "y"), tombstone = false),
      KeyedRow("3", Seq("c", "z"), tombstone = false))
    val batch2 = Seq(
      KeyedRow("1", Seq("a", "x"), tombstone = false), // unchanged → no event
      KeyedRow("2", Seq("B", "y"), tombstone = false), // updated
      KeyedRow("3", Seq.empty, tombstone = true),      // deleted
      KeyedRow("4", Seq("d", "w"), tombstone = false)) // inserted

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedRow]
    val q = StreamingDiff.diffStream(input.toDS(), colNames)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("graft_cdc").start()
    input.addData(batch1)
    q.processAllAvailable()
    // capture the initial-load events, then feed the second snapshot
    val initial = spark.table("graft_cdc").as[DiffEvent].collect()
    input.addData(batch2)
    q.processAllAvailable()
    q.stop()

    val all = spark.table("graft_cdc").as[DiffEvent].collect()
    val secondBatch = all.drop(initial.length)
      .map(e => (e.key, e.diff_status, e.modified_columns, e.side)).toSet

    // initial load: every snapshot-1 row surfaces as INSERTED
    assert(initial.map(_.diff_status).toSet == Set("INSERTED") && initial.length == 3)
    // second batch reproduces the batch diff exactly
    assert(secondBatch == batch)
  }

  test("tombstone for unknown key is ignored; re-insert after delete works") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedRow]
    val q = StreamingDiff.diffStream(input.toDS(), colNames)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("graft_cdc2").start()
    input.addData(Seq(
      KeyedRow("9", Seq.empty, tombstone = true),       // unknown delete
      KeyedRow("5", Seq("v", "w"), tombstone = false))) // insert
    q.processAllAvailable()
    input.addData(Seq(
      KeyedRow("5", Seq.empty, tombstone = true),       // delete
      KeyedRow("5", Seq("v2", "w"), tombstone = false))) // re-insert
    q.processAllAvailable()
    q.stop()
    val evs = spark.table("graft_cdc2").as[DiffEvent].collect()
      .map(e => (e.key, e.diff_status)).toList
    assert(evs == List(("5", "INSERTED"), ("5", "DELETED"), ("5", "INSERTED")))
  }
}
