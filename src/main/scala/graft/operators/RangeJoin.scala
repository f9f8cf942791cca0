package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval containment) join: match each point row to every range
  * row with `lo <= point < hi`.
  *
  * The reference has no join kinds beyond its keyed diff (SURVEY §2.3), but
  * a data-pipeline engine needs range predicates, and Spark's naive form —
  * `points.join(ranges, p >= lo && p < hi)` — plans as a broadcast
  * nested-loop join: every point row tested against every range row,
  * O(|points|·|ranges|), the classic 100 TB scale-killer.
  *
  * Scale-true plan: overlay a fixed-width bucket grid. Each range row is
  * exploded to the buckets it overlaps (`sequence(floor(lo/w),
  * floor(hi/w))` — cheap when range spans are bounded multiples of `w`),
  * each point belongs to exactly ONE bucket, and the join becomes an
  * EQUI-join on bucket id that Catalyst plans as broadcast-hash or
  * sort-merge like any other key join — shuffle-partitionable on both
  * sides, no quadratic pair enumeration. A residual `lo <= p < hi` filter
  * removes same-bucket near-misses. Each (point, range) pair meets in at
  * most one bucket (the point's), so no dedup is needed.
  */
object RangeJoin {
  /** Inner range join. `bucketWidth` should be on the order of the typical
    * range span: too small explodes ranges into many buckets, too large
    * makes the residual filter discard most candidates. `extraKeys` are
    * additional equi-join columns (present on both sides, e.g. a user key
    * for a per-user time-interval join) — they join alongside the bucket,
    * so the shuffle co-locates on (key, bucket) and hot buckets spread
    * across the key space. */
  def bucketized(points: DataFrame, ranges: DataFrame, pointCol: String,
      loCol: String, hiCol: String, bucketWidth: Double,
      extraKeys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def bucketOf(c: Column): Column = floor(c / bucketWidth).cast("long")
    val exploded = ranges.withColumn("__bucket",
      explode(sequence(bucketOf(col(loCol)), bucketOf(col(hiCol)))))
    points.withColumn("__bucket", bucketOf(col(pointCol)))
      .join(exploded, "__bucket" +: extraKeys)
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bucket")
  }
}
