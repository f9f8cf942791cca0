package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-phase running sum for VALUE-SKEWED window partitions.
  *
  * A plain `sum(x) over (partition by key order by ts)` concentrates each
  * key's entire history in one task — one user with 10⁹ events is one
  * 10⁹-row sort on one executor, the window analogue of join skew (AQE
  * splits skewed joins but not skewed windows). The classical fix is
  * prefix-sum decomposition: split each key's timeline into ORDERED chunks
  * (here: time buckets of `chunkCol`, e.g. day(ts) — any monotone function
  * of the order column works), then
  *
  *   1. running sum WITHIN each (key, chunk) — parallel across chunks,
  *      partition size bounded by the busiest single chunk;
  *   2. per-(key, chunk) totals, cumulated per key over the SMALL chunk
  *      frame (one row per key×chunk, not per event);
  *   3. each row's global running sum = its within-chunk running sum plus
  *      its key's prior-chunk offset (an equi-join on (key, chunk), which
  *      co-partitions with phase 1's shuffle).
  *
  * Sums accumulate in exact decimal, so the decomposition is bit-equal to
  * the single-partition window (pinned by `Round3OperatorsSpec`). */
object SkewWindow {
  /** Adds `outCol` = running sum of `value` per `key` ordered by
    * (`chunkCol`, `orderCols`), never materializing a whole key in one
    * window partition. `chunkCol` must be monotone in the intended order
    * (a time bucket of the order column). */
  def runningSum(df: DataFrame, key: Column, chunkCol: Column,
      orderCols: Seq[Column], value: Column, outCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,4)")
    val tagged = df.withColumn("__sw_chunk", chunkCol)
    val w1 = Window.partitionBy(key, col("__sw_chunk"))
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = tagged.withColumn("__sw_within", sum(dec(value)).over(w1))
    val w2 = Window.partitionBy(col("__sw_key")).orderBy(col("__sw_chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = tagged
      .groupBy(key.as("__sw_key"), col("__sw_chunk"))
      .agg(sum(dec(value)).as("__sw_tot"))
      .withColumn("__sw_off",
        coalesce(sum(col("__sw_tot")).over(w2), dec(lit(0))))
      .select(col("__sw_key"), col("__sw_chunk").as("__sw_chunk2"), col("__sw_off"))
    within
      .join(offsets, key === col("__sw_key") &&
        col("__sw_chunk") === col("__sw_chunk2"))
      .withColumn(outCol,
        (col("__sw_within") + col("__sw_off")).cast("decimal(38,4)"))
      .drop("__sw_key", "__sw_chunk", "__sw_chunk2", "__sw_within", "__sw_off")
  }
}
