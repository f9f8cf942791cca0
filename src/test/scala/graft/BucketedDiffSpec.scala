package graft

import graft.operators.{BucketedSnapshots, DiffQueries, Normalize, SnapshotDiff}

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

  test("store-backed changefeed and report: plain results, snapshot-side zero Exchange") {
    val key = (r: org.apache.spark.sql.Row) => r.toSeq.map(String.valueOf).mkString("|")
    // two tables so the union/fusion paths are exercised, not just 1-table
    val ts = Seq(Tables.nation, Tables.region)
    val dir = java.nio.file.Files.createTempDirectory("graft_buckets_feed")
    val pairs = ts.map { t =>
      val before = Tables.load(spark, Sf, t.name)
      val after = DiffQueries.after(spark, Sf, t)
      BucketedSnapshots.write(before, t.pk, s"feed_b_${t.name}", s"$dir/b_${t.name}", 4)
      BucketedSnapshots.write(after, t.pk, s"feed_a_${t.name}", s"$dir/a_${t.name}", 4)
      (s"feed_b_${t.name}", s"feed_a_${t.name}", t.name, before, after, t)
    }
    val stored = pairs.map { case (b, a, n, _, _, _) => (b, a, n) }

    // changefeed: identical rows to the plain multi-table feed, and the
    // WHOLE export plans with zero Exchange (pack projections preserve
    // the bucket distribution; unions concatenate)
    val feed = BucketedSnapshots.changefeed(spark, stored)
    val plainFeed = pairs.map { case (_, _, n, before, after, t) =>
      SnapshotDiff.feedCompact(before, after, t.pk, n, t.cols)
    }.reduce(_.unionByName(_))
    assert(feed.collect().map(key).sorted.toSeq
      == plainFeed.collect().map(key).sorted.toSeq)
    val feedPlan = feed.queryExecution.executedPlan.toString
    assert(!feedPlan.contains("Exchange"),
      s"expected shuffle-free changefeed export, got:\n$feedPlan")

    // report: same counts as the fused plain report restricted to these
    // tables; the ONLY exchanges are status-count partials — nothing may
    // ever repartition by __key (snapshot-sized movement)
    val rep = BucketedSnapshots.report(spark, stored)
    val plainRep = SnapshotDiff.fusedReport(pairs.map {
      case (_, _, n, before, after, t) => (n, before, after, t.pk) })
    assert(rep.collect().map(key).sorted.toSeq
      == plainRep.collect().map(key).sorted.toSeq)
    val repPlan = rep.queryExecution.executedPlan.toString
    assert(!repPlan.contains(s"Exchange hashpartitioning(${Normalize.KeyCol}"),
      s"report reshuffled snapshot rows by __key:\n$repPlan")
    assert(!repPlan.contains("Exchange rangepartitioning"), repPlan.take(2000))

    pairs.foreach { case (b, a, _, _, _, _) =>
      spark.sql(s"DROP TABLE IF EXISTS $b")
      spark.sql(s"DROP TABLE IF EXISTS $a")
    }
  }
}
