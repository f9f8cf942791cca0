package graft

import graft.functions.SampleSketch
import graft.operators.SketchQueries
import org.apache.spark.sql.functions._

/** Bottom-k sample sketch: exact-degradation, merge-path determinism, and
  * quantile accuracy (see [[graft.functions.SampleSketch]]). */
class SampleSketchSpec extends SparkTestBase {

  private def sampQ(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy(col("event_type"))
      .agg(SampleSketch.bottomKSample(col("value"), col("event_id").cast("string"), k)
        .as("samp"))

  test("a group smaller than k degrades to the exact sorted value set") {
    val ev = Tables.load(spark, Sf, "events")
    val got = sampQ(ev, 1 << 20).collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val want = ev.collect()
      .groupBy(_.getAs[String]("event_type"))
      .map { case (t, rows) => t -> rows.map(_.getAs[Double]("value")).sorted.toSeq }
    assert(got == want)
  }

  test("sample is invariant to partitioning and merge order") {
    val ev = Tables.load(spark, Sf, "events")
    val a = sampQ(ev.repartition(2), SketchQueries.SampleK).collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val b = sampQ(ev.repartition(17, col("value")), SketchQueries.SampleK).collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(a == b && a.nonEmpty)
  }

  test("sample median lands in the exact interquartile range (k=128, n~2000)") {
    val sf01 = "/root/testdata/sf0.01"
    val ev = Tables.load(spark, sf01, "events")
    val exact = ev.groupBy(col("event_type"))
      .agg(expr("percentile(value, array(0.25, 0.75))").as("iqr"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val medians = SketchQueries.queries("sketch_sample_quantiles")(spark, sf01)
      .select(col("event_type"), col("p50")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(medians.nonEmpty)
    medians.foreach { case (t, p50) =>
      val Seq(lo, hi) = exact(t)
      assert(p50 >= lo && p50 <= hi, s"$t: sample p50 $p50 outside exact IQR [$lo, $hi]")
    }
  }

}
