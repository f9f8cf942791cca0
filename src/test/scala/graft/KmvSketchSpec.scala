package graft

import graft.functions.KmvSketch
import org.apache.spark.sql.functions._

class KmvSketchSpec extends SparkTestBase {
  import spark.implicits._

  test("below-k groups are exact; estimate is partition-order independent") {
    val df = (1 to 100).map(i => ("g", s"v$i")).toDF("g", "x")
    val r1 = df.groupBy($"g").agg(KmvSketch.kmvDistinct($"x", 256).as("e")).head().getLong(1)
    assert(r1 == 100 * 1000L) // < k path: exact count in milli-units
    // same data shuffled into many partitions → identical result (merge path)
    val r2 = df.repartition(13, $"x")
      .groupBy($"g").agg(KmvSketch.kmvDistinct($"x", 256).as("e")).head().getLong(1)
    assert(r1 == r2)
  }

  test("estimator path lands within 15% of the true cardinality") {
    val n = 20000
    val df = (1 to n).map(i => ("g", s"value_$i")).toDF("g", "x")
    val est = df.repartition(8)
      .groupBy($"g").agg(KmvSketch.kmvDistinct($"x", 256).as("e"))
      .head().getLong(1) / 1000.0
    assert(math.abs(est - n) / n < 0.15, s"estimate $est vs true $n")
  }

  test("duplicates do not move the estimate (set semantics)") {
    val base = (1 to 5000).map(i => ("g", s"v$i"))
    val dup = base ++ base ++ base
    val e1 = base.toDF("g", "x").groupBy($"g")
      .agg(KmvSketch.kmvDistinct($"x", 64).as("e")).head().getLong(1)
    val e2 = dup.toDF("g", "x").repartition(7).groupBy($"g")
      .agg(KmvSketch.kmvDistinct($"x", 64).as("e")).head().getLong(1)
    assert(e1 == e2)
  }
}
