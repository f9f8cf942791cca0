package graft

import graft.operators.{BucketedSnapshots, DiffQueries, SnapshotDiff}

/** Scale bench for the bucketed snapshot store:
  * `runMain graft.BucketedBench <sfDir> <workDir> [numBuckets] [attempts]`.
  *
  * Writes the lineitem before/after snapshots hash-bucketed by `__key`
  * (once, untimed — the store's one-off ingest cost, reported separately),
  * machine-asserts the bucketed diff's physical plan contains ZERO
  * Exchange at THIS scale (the `BucketedDiffSpec` gate, re-run on real
  * data instead of the 25-row fixture), then times the bucketed diff and
  * the plain shuffled diff back to back — the measured answer to "is the
  * bucketed write worth it when snapshots are diffed repeatedly".
  * Prints one JSON line.
  */
object BucketedBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val work = args(1)
    val buckets = if (args.length > 2) args(2).toInt else 32
    val n = if (args.length > 3) args(3).toInt else 3
    val spark = GraftSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      "graft-bucketbench")
    val t = Tables.lineitem
    val before = Tables.load(spark, sfDir, t.name)
    val after = DiffQueries.after(spark, sfDir, t)

    val t0 = System.nanoTime()
    BucketedSnapshots.write(before, t.pk, "bb_before", s"$work/before", buckets)
    BucketedSnapshots.write(after, t.pk, "bb_after", s"$work/after", buckets)
    val writeSec = (System.nanoTime() - t0) / 1e9

    def bucketed() = BucketedSnapshots.diff(spark, "bb_before", "bb_after")
    val plan = bucketed().queryExecution.executedPlan.toString
    require(!plan.contains("Exchange"),
      s"bucketed diff plan at $sfDir is not Exchange-free:\n$plan")

    def time(fn: () => org.apache.spark.sql.DataFrame): Seq[Double] =
      (1 to n).map { _ =>
        val s = System.nanoTime(); fn().count(); (System.nanoTime() - s) / 1e9
      }
    val bucketedT = time(() => bucketed())
    val plainT = time(() => SnapshotDiff.diff(before, after, t.pk))

    def num(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def arr(vs: Seq[Double]) = vs.map(num).mkString("[", ",", "]")
    println(s"""{"metric":"bucketed_diff_lineitem","sf":"$sfDir","buckets":$buckets,""" +
      s""""exchange_free":true,"write_sec":${num(writeSec)},""" +
      s""""bucketed_sec":${arr(bucketedT)},"plain_sec":${arr(plainT)}}""")
    spark.sql("DROP TABLE IF EXISTS bb_before")
    spark.sql("DROP TABLE IF EXISTS bb_after")
    spark.stop()
  }
}
