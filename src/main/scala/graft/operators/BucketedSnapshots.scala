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

  /** Advance the store by one generation: diff two bucketed snapshots and
    * apply the result back onto `beforeTable`, writing the reconstruction
    * as the next bucketed generation. The diff join and the one-winner
    * dedups consume the buckets' hash distribution (zero Exchange, as in
    * [[diff]]); the ONLY exchange in the whole plan is the
    * deleted/updated-KEY distinct — delta-sized, keys only — which then
    * broadcasts into the anti-join, so the base snapshot itself streams
    * bucket-to-output without ever reshuffling (asserted by
    * `BucketedDiffSpec`: exactly one hash Exchange, anti-join is
    * broadcast). At 100 TB this is snapshot-store compaction where the
    * only full-width data movement is the file write; what shuffles is
    * proportional to what changed, not to the table. */
  def advance(spark: SparkSession, beforeTable: String, afterTable: String,
      nextTable: String, path: String, numBuckets: Int): DataFrame = {
    val bn = SnapshotDiff.oneRowPerKey(spark.table(beforeTable))
    val an = SnapshotDiff.oneRowPerKey(spark.table(afterTable))
    val next = SnapshotDiff.applyDiffNormalized(bn, SnapshotDiff.diffNormalized(bn, an))
    next.write.format("parquet")
      .bucketBy(numBuckets, Normalize.KeyCol)
      .sortBy(Normalize.KeyCol)
      .option("path", path)
      .mode("overwrite")
      .saveAsTable(nextTable)
    next
  }

  /** Per-status report over two bucketed snapshot tables. */
  def statusCounts(spark: SparkSession, beforeTable: String, afterTable: String): DataFrame =
    SnapshotDiff.classifyNormalized(spark.table(beforeTable), spark.table(afterTable))
      .filter(col("diff_status") =!= SnapshotDiff.NotModified)
      .groupBy(col("diff_status"))
      .agg(countDistinct(col(Normalize.KeyCol)).as("n_keys"))

  /** Multi-table changefeed export off the store — `diff_changefeed`'s
    * store-backed form: each table's feed is
    * [[SnapshotDiff.feedCompactNormalized]] over its two bucketed
    * generations (pack projection preserves the buckets' hash
    * distribution → the full-outer join sort-merges bucket-to-bucket),
    * and the per-table feeds union by concatenation. ZERO Exchange in the
    * whole export plan — where the plain changefeed pays one full-width
    * shuffle per side per table, the store-backed feed streams every
    * bucket straight to the sink. Gated by `BucketedDiffSpec`. */
  def changefeed(spark: SparkSession,
      tables: Seq[(String, String, String)]): DataFrame =
    tables.map { case (beforeTable, afterTable, name) =>
      val bn = spark.table(beforeTable)
      SnapshotDiff.feedCompactNormalized(bn, spark.table(afterTable), name,
        bn.columns.filterNot(_ == Normalize.KeyCol).toIndexedSeq)
    }.reduce(_.unionByName(_))

  /** Whole-lake report off the store — `diff_report`'s store-backed form.
    * The plain report fuses N tables into ONE fingerprint shuffle because
    * re-shuffling the lake N times is the thing to avoid; with bucketed
    * generations there is nothing to avoid — each table's classification
    * join is bucket-to-bucket (zero Exchange), the per-key distinct
    * reuses the join's `__key` clustering (HashPartitioning(__key)
    * satisfies the (status, key) grouping — no exchange), and the only
    * shuffled rows are the ≤ N×3 per-partition status-count partials.
    * Snapshot-side data NEVER moves. Gated by `BucketedDiffSpec`. */
  def report(spark: SparkSession,
      tables: Seq[(String, String, String)]): DataFrame =
    tables.map { case (beforeTable, afterTable, name) =>
      SnapshotDiff.classifyNormalized(
          spark.table(beforeTable), spark.table(afterTable))
        .filter(col("diff_status") =!= SnapshotDiff.NotModified)
        .groupBy(col("diff_status"))
        .agg(countDistinct(col(Normalize.KeyCol)).as("n_keys"))
        .select(lit(name).as("table_name"), col("diff_status"), col("n_keys"))
    }.reduce(_.unionByName(_))
}
