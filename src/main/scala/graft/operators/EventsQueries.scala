package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators over the `events` table: tumbling-window
  * aggregation and gap-based sessionization — the batch forms of the
  * Structured Streaming pipeline in `graft.streaming` (same column logic,
  * checkable by the DuckDB oracle; the streaming variant adds watermarking).
  *
  * Determinism: bucket identity and session gaps are computed on
  * microsecond epochs (exact integers); value sums go through
  * DECIMAL(38,4). Window orderings carry `event_id` as a unique tiebreaker.
  */
object EventsQueries {
  type Q = (SparkSession, String) => DataFrame

  val SessionGapMicros: Long = 30L * 60 * 1000000 // 30 min

  /** Gap-based sessionization: session starts where the per-user gap
    * exceeds 30 min; session_id = running count of session starts. */
  def sessionize(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gap = unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)
    events
      .withColumn("__is_new", when(gap.isNull.or(gap > SessionGapMicros), 1L).otherwise(0L))
      .withColumn("session_id", sum(col("__is_new")).over(run))
      .drop("__is_new")
  }

  val queries: Map[String, Q] = Map(
    // Tumbling 5-minute windows via the native window() operator; the
    // epoch-aligned start matches DuckDB's time_bucket.
    "events_tumbling" -> ((spark, sfDir) =>
      Tables.load(spark, sfDir, "events")
        .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(38,4)")).cast("double").as("total_value"))
        .select(col("window.start").as("bucket_start"), col("event_type"),
          col("n_events"), col("total_value"))),
    "events_sessionize" -> ((spark, sfDir) =>
      sessionize(Tables.load(spark, sfDir, "events"))
        .select(col("user_id"), col("event_id"), col("session_id"))),
    "events_session_stats" -> ((spark, sfDir) =>
      sessionize(Tables.load(spark, sfDir, "events"))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          (max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))).as("duration_us"),
          sum(col("value").cast("decimal(38,4)")).cast("double").as("total_value")))
  )

  private val sessionizeSql: String =
    s"""SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
       |FROM (
       |  SELECT *, CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > $SessionGapMicros
       |                 THEN 1 ELSE 0 END AS is_new
       |  FROM (
       |    SELECT *, LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
       |    FROM events) t1) t2""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "events_tumbling" ->
      """SELECT time_bucket(INTERVAL '5 minutes', ts) AS bucket_start, event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS total_value
        |FROM events GROUP BY bucket_start, event_type""".stripMargin,
    "events_sessionize" ->
      s"SELECT user_id, event_id, session_id FROM ($sessionizeSql) s",
    "events_session_stats" ->
      s"""SELECT user_id, session_id, COUNT(*) AS n_events,
         |  MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS duration_us,
         |  CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS total_value
         |FROM ($sessionizeSql) s GROUP BY user_id, session_id""".stripMargin
  )
}
