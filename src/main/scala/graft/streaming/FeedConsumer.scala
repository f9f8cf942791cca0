package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Streaming consumer for the application loop's change feed
  * ([[graft.app.DbDiffApp]] `feedDir`): the downstream half of the CDC
  * story. The app (or any producer) lands fixed-width feed batches as
  * parquet; this consumer tails the directory as a file-source stream and
  * maintains per-table per-status distinct-key counts — the reference's
  * report (A-series), kept continuously current instead of reprinted per
  * iteration.
  *
  * Distinctness is a streaming `dropDuplicates` on (table, key, status) —
  * UPDATED keys arrive as a BEFORE+AFTER pair and must count once, exactly
  * like the batch `statusCounts`' COUNT(DISTINCT __key). State is
  * O(distinct changed keys), sharded by the engine; the aggregate itself
  * is a native streaming aggregation.
  */
object FeedConsumer {
  /** The feed's fixed-width schema ([[graft.operators.SnapshotDiff.feed]]). */
  val FeedSchema: StructType = StructType(Seq(
    StructField("table_name", StringType, nullable = false),
    StructField("__key", StringType, nullable = true),
    StructField("diff_status", StringType, nullable = true),
    StructField("modified_columns", StringType, nullable = true),
    StructField("side", StringType, nullable = true),
    StructField("row_fp", StringType, nullable = true)))

  /** File-source stream over a feed directory glob (e.g. `dir/iter_*`). */
  def readFeed(spark: SparkSession, pathGlob: String): DataFrame =
    spark.readStream.schema(FeedSchema).parquet(pathGlob)

  /** Continuously-current per-table per-status distinct-key counts. Run
    * with Complete output mode. */
  def statusCounts(feed: DataFrame): DataFrame =
    feed
      .dropDuplicates(Seq("table_name", "__key", "diff_status"))
      .groupBy(col("table_name"), col("diff_status"))
      .agg(count(lit(1)).as("n_keys"))
}
