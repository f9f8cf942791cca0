package graft

import graft.operators.{BucketedSnapshots, DiffQueries, SnapshotDiff}

/** Scale bench for the store-backed multi-table exports:
  * `runMain graft.BucketedFeedBench <sfDir> <workDir> [numBuckets] [attempts]`.
  *
  * Writes every diffable table's before/after snapshot hash-bucketed by
  * `__key` (once, untimed — the store's one-off ingest, reported
  * separately), machine-asserts the store-backed changefeed plans with
  * ZERO Exchange and the store-backed report never repartitions by
  * `__key` at THIS scale (the `BucketedDiffSpec` gates re-run on real
  * data), then times the store-backed changefeed/report against the plain
  * `diff_changefeed`/`diff_report` shapes back to back. Prints one JSON
  * line. Companion to [[BucketedBench]] (single-table diff). */
object BucketedFeedBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val work = args(1)
    val buckets = if (args.length > 2) args(2).toInt else 32
    val n = if (args.length > 3) args(3).toInt else 3
    val spark = GraftSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      "graft-bucketfeedbench")

    val t0 = System.nanoTime()
    val stored = Tables.diffable.map { t =>
      val before = Tables.load(spark, sfDir, t.name)
      val after = DiffQueries.after(spark, sfDir, t)
      BucketedSnapshots.write(before, t.pk, s"bf_b_${t.name}", s"$work/b_${t.name}", buckets)
      BucketedSnapshots.write(after, t.pk, s"bf_a_${t.name}", s"$work/a_${t.name}", buckets)
      (s"bf_b_${t.name}", s"bf_a_${t.name}", t.name)
    }
    val writeSec = (System.nanoTime() - t0) / 1e9

    def feed() = BucketedSnapshots.changefeed(spark, stored)
    def report() = BucketedSnapshots.report(spark, stored)
    val feedPlan = feed().queryExecution.executedPlan.toString
    require(!feedPlan.contains("Exchange"),
      s"store changefeed at $sfDir is not Exchange-free:\n$feedPlan")
    val repPlan = report().queryExecution.executedPlan.toString
    require(!repPlan.contains("Exchange hashpartitioning(__key"),
      s"store report at $sfDir reshuffles snapshot rows:\n$repPlan")

    def time(fn: () => org.apache.spark.sql.DataFrame): Seq[Double] =
      (1 to n).map { _ =>
        val s = System.nanoTime(); fn().count(); (System.nanoTime() - s) / 1e9
      }
    val feedT = time(() => feed())
    val repT = time(() => report())
    val plainFeedT = time(() => SparkEntry.queries("diff_changefeed")(spark, sfDir))
    val plainRepT = time(() => SparkEntry.queries("diff_report")(spark, sfDir))

    def num(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def arr(vs: Seq[Double]) = vs.map(num).mkString("[", ",", "]")
    println(s"""{"metric":"bucketed_feed_report","sf":"$sfDir","buckets":$buckets,""" +
      s""""exchange_free_feed":true,"write_sec":${num(writeSec)},""" +
      s""""feed_sec":${arr(feedT)},"report_sec":${arr(repT)},""" +
      s""""plain_feed_sec":${arr(plainFeedT)},"plain_report_sec":${arr(plainRepT)}}""")
    stored.foreach { case (b, a, _) =>
      spark.sql(s"DROP TABLE IF EXISTS $b")
      spark.sql(s"DROP TABLE IF EXISTS $a")
    }
    spark.stop()
  }
}
