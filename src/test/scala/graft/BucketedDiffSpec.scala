package graft

import graft.operators.{BucketedSnapshots, DiffQueries, SnapshotDiff}

/** The bucketed snapshot store produces identical diffs with a
  * shuffle-free physical plan. */
class BucketedDiffSpec extends SparkTestBase {

  test("bucketed diff equals plain diff and plans with zero Exchange") {
    val t = Tables.nation
    val before = Tables.load(spark, Sf, t.name)
    val after = DiffQueries.after(spark, Sf, t)
    val dir = java.nio.file.Files.createTempDirectory("graft_buckets")

    BucketedSnapshots.write(before, t.pk, "snap_before", s"$dir/before", 4)
    BucketedSnapshots.write(after, t.pk, "snap_after", s"$dir/after", 4)

    val bucketed = BucketedSnapshots.diff(spark, "snap_before", "snap_after")
    val plain = SnapshotDiff.diff(before, after, t.pk)

    val key = (r: org.apache.spark.sql.Row) => r.toSeq.map(String.valueOf).mkString("|")
    assert(bucketed.collect().map(key).sorted.toSeq == plain.collect().map(key).sorted.toSeq)

    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free plan, got:\n$plan")

    val counts = BucketedSnapshots.statusCounts(spark, "snap_before", "snap_after")
    val fromPlain = SnapshotDiff.statusCounts(before, after, t.pk)
    assert(counts.collect().map(key).sorted.toSeq == fromPlain.collect().map(key).sorted.toSeq)

    // SCD2 over the bucketed store: same history, still zero Exchange
    val hist = BucketedSnapshots.scd2(spark, "snap_before", "snap_after")
    val plainHist = SnapshotDiff.scd2(before, after, t.pk)
    assert(hist.collect().map(key).sorted.toSeq == plainHist.collect().map(key).sorted.toSeq)
    val histPlan = hist.queryExecution.executedPlan.toString
    assert(!histPlan.contains("Exchange"), s"expected shuffle-free SCD2 plan, got:\n$histPlan")

    // advance: apply the diff back onto the bucketed before snapshot and
    // write the next generation. The base table must never reshuffle —
    // the only hash Exchange allowed is the delta-sized changed-KEY
    // distinct (the full-outer join output loses its reported
    // partitioning), which then broadcasts into the anti-join.
    val next = BucketedSnapshots.advance(
      spark, "snap_before", "snap_after", "snap_next", s"$dir/next", 4)
    val nextPlan = next.queryExecution.executedPlan.toString
    val nHashEx = nextPlan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(nHashEx == 1, s"expected exactly one (delta-keys) Exchange, got $nHashEx:\n$nextPlan")
    assert(nextPlan.contains("BroadcastHashJoin") && nextPlan.contains("LeftAnti"),
      s"expected broadcast anti-join over the streamed base, got:\n$nextPlan")
    val nextCols = spark.table("snap_next").columns.sorted.toIndexedSeq
    val expected = SnapshotDiff.oneRowPerKey(spark.table("snap_after"))
    assert(spark.table("snap_next").select(nextCols.map(org.apache.spark.sql.functions.col): _*)
      .collect().map(key).sorted.toSeq
      == expected.select(nextCols.map(org.apache.spark.sql.functions.col): _*)
        .collect().map(key).sorted.toSeq)
    // and a follow-up diff over the NEW generation is still Exchange-free
    val regen = BucketedSnapshots.diff(spark, "snap_next", "snap_after")
    assert(!regen.queryExecution.executedPlan.toString.contains("Exchange"))
    assert(regen.isEmpty) // next == after ⇒ empty diff

    spark.sql("DROP TABLE IF EXISTS snap_before")
    spark.sql("DROP TABLE IF EXISTS snap_after")
    spark.sql("DROP TABLE IF EXISTS snap_next")
  }
}
