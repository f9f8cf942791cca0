package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed snapshot store: the 100 TB diff layout.
  *
  * The unavoidable cost of a keyed snapshot diff is co-locating the two
  * sides by key — one shuffle per snapshot per diff when snapshots are
  * plain files. At 100 TB that shuffle IS the job. This store removes it:
  * snapshots are written once, normalized and hash-bucketed (+ sorted) by
  * `__key`, so every subsequent diff against any other snapshot of the same
  * table sort-merge-joins bucket-to-bucket with ZERO exchange and zero
  * sort — verified by `BucketedDiffSpec`, which asserts the physical plan
  * contains no Exchange node.
  *
  * Snapshots are diffed many times (the reference's loop re-diffs on every
  * iteration, `cmd/dbdiff/main.go:62-87`), so paying one bucketed write per
  * snapshot to make every diff shuffle-free is the right trade at scale.
  * On a real cluster the same layout comes from writing snapshot deltas
  * with `DISTRIBUTE BY hash(__key)` into bucketed tables.
  */
object BucketedSnapshots {
  /** Normalize + key + write hash-bucketed and sorted by `__key`. */
  def write(df: DataFrame, pk: Seq[String], table: String, path: String,
      numBuckets: Int): Unit =
    Normalize.withKey(df, pk)
      .write.format("parquet")
      .bucketBy(numBuckets, Normalize.KeyCol)
      .sortBy(Normalize.KeyCol)
      .option("path", path)
      .mode("overwrite")
      .saveAsTable(table)

  /** Diff two bucketed snapshot tables — plans with no Exchange. */
  def diff(spark: SparkSession, beforeTable: String, afterTable: String): DataFrame =
    SnapshotDiff.diffNormalized(spark.table(beforeTable), spark.table(afterTable))

  /** SCD2 history over two bucketed snapshot tables — the one-winner
    * aggregations and the full-outer join all consume the bucketed
    * layout's hash distribution, so the whole history build plans with
    * zero Exchange (asserted by `BucketedDiffSpec`). */
  def scd2(spark: SparkSession, beforeTable: String, afterTable: String): DataFrame =
    SnapshotDiff.scd2Normalized(
      SnapshotDiff.oneRowPerKey(spark.table(beforeTable)),
      SnapshotDiff.oneRowPerKey(spark.table(afterTable)))

  /** Per-status report over two bucketed snapshot tables. */
  def statusCounts(spark: SparkSession, beforeTable: String, afterTable: String): DataFrame =
    SnapshotDiff.classifyNormalized(spark.table(beforeTable), spark.table(afterTable))
      .filter(col("diff_status") =!= SnapshotDiff.NotModified)
      .groupBy(col("diff_status"))
      .agg(countDistinct(col(Normalize.KeyCol)).as("n_keys"))
}
