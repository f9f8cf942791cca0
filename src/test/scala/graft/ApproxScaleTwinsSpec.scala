package graft

import org.apache.spark.sql.functions._

/** The oracle gate forces exact forms (a DuckDB hash-compare can't check a
  * sketch), so the at-scale approximate twins the operators document —
  * "swap X for approx Y at 100 TB" — are pinned HERE against their exact
  * counterparts instead. This is the same discipline as `IvfRecallSpec`:
  * the approximate path must exist and its error must be bounded by a
  * test, not a comment. */
class ApproxScaleTwinsSpec extends SparkTestBase {
  import spark.implicits._

  test("approx_count_distinct stays within 5% of the profiler's exact distinct counts") {
    val orders = Tables.load(spark, Sf, "orders")
    Tables.orders.cols.foreach { c =>
      val exact = orders.agg(countDistinct(col(c))).as[Long].head()
      // rsd 0.02 → HLL++ with ~2% standard error; assert a 5% envelope
      val approx = orders.agg(approx_count_distinct(col(c), 0.02)).as[Long].head()
      assert(math.abs(approx - exact).toDouble <= math.max(1.0, exact * 0.05),
        s"$c: approx=$approx exact=$exact")
    }
  }

  test("approx_percentile lands within the exact neighboring-quantile bracket") {
    val events = Tables.load(spark, Sf, "events")
    // exact p40/p50/p60 by rank arithmetic (the events_value_quantiles method)
    val n = events.count()
    val sorted = events.select(col("value")).orderBy(col("value"))
      .as[Double].collect()
    def exactQ(p: Double): Double = sorted((p * n).ceil.toInt.min(sorted.length) - 1)
    val approxMedian = events
      .agg(expr("approx_percentile(value, 0.5, 10000)")).as[Double].head()
    // the sketch's median must land inside the exact [p40, p60] bracket —
    // a loose, deterministic envelope that survives any sketch tie-breaks
    assert(approxMedian >= exactQ(0.40) && approxMedian <= exactQ(0.60),
      s"approx median $approxMedian outside [${exactQ(0.40)}, ${exactQ(0.60)}]")
  }

  test("KMV distinct estimate tracks exact distinct within its k-bound error") {
    import graft.functions.KmvSketch
    val docs = Tables.load(spark, Sf, "documents")
    val exact = docs.agg(countDistinct(col("source"))).as[Long].head()
    val estMillis = docs
      .agg(KmvSketch.kmvDistinct(col("source").cast("string"), 256))
      .as[Long].head()
    // tiny cardinalities resolve exactly under KMV with k >= cardinality
    assert(math.round(estMillis / 1000.0) == exact, s"kmv=$estMillis exact=$exact")
  }
}
