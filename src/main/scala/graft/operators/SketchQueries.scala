package graft.operators

import graft.Tables
import graft.functions.KmvSketch
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch-based summary queries (KMV distinct estimation).
  *
  * Each query emits the sketch estimate NEXT TO the exact distinct count,
  * so the oracle validates both the sketch arithmetic (hash-exact, see
  * [[graft.functions.KmvSketch]]) and its accuracy envelope in one row set.
  */
object SketchQueries {
  type Q = (SparkSession, String) => DataFrame

  val K = 256

  val queries: Map[String, Q] = Map(
    // per-group sketch: small groups take the exact (<k) path, large ones
    // the estimator path — both branches land in the oracle comparison
    "sketch_kmv_groups" -> ((spark, sfDir) =>
      Tables.load(spark, sfDir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          KmvSketch.kmvDistinct(col("l_orderkey").cast("string"), K).as("kmv_millis"),
          countDistinct(col("l_orderkey")).as("exact_nd"))),
    // one global group: the merge path runs across every input partition
    "sketch_kmv_global" -> ((spark, sfDir) =>
      Tables.load(spark, sfDir, "orders")
        .agg(
          KmvSketch.kmvDistinct(col("o_custkey").cast("string"), K).as("kmv_millis"),
          countDistinct(col("o_custkey")).as("exact_nd")))
  )

  private val hv = KmvSketch.hashSql("CAST(l_orderkey AS VARCHAR)")
  private val hvCust = KmvSketch.hashSql("CAST(o_custkey AS VARCHAR)")

  val oracleSql: Map[String, String] = Map(
    "sketch_kmv_groups" ->
      s"""WITH h AS (
         |  SELECT l_returnflag, l_linestatus, $hv AS hvv
         |  FROM lineitem GROUP BY 1, 2, 3),
         |r AS (
         |  SELECT l_returnflag, l_linestatus, hvv,
         |         ROW_NUMBER() OVER (PARTITION BY l_returnflag, l_linestatus ORDER BY hvv) AS rn,
         |         COUNT(*) OVER (PARTITION BY l_returnflag, l_linestatus) AS nd
         |  FROM h)
         |SELECT l_returnflag, l_linestatus,
         |       CAST(CASE WHEN MIN(nd) < $K THEN MIN(nd) * 1000
         |            ELSE floor(${K - 1}.0 / (MAX(CASE WHEN rn = $K THEN hvv END)
         |                 / 1152921504606846976.0) * 1000.0 + 0.5) END AS BIGINT) AS kmv_millis,
         |       CAST(MIN(nd) AS BIGINT) AS exact_nd
         |FROM r GROUP BY 1, 2""".stripMargin,
    "sketch_kmv_global" ->
      s"""WITH h AS (SELECT DISTINCT $hvCust AS hvv FROM orders),
         |r AS (
         |  SELECT hvv, ROW_NUMBER() OVER (ORDER BY hvv) AS rn,
         |         COUNT(*) OVER () AS nd
         |  FROM h)
         |SELECT CAST(CASE WHEN MIN(nd) < $K THEN MIN(nd) * 1000
         |            ELSE floor(${K - 1}.0 / (MAX(CASE WHEN rn = $K THEN hvv END)
         |                 / 1152921504606846976.0) * 1000.0 + 0.5) END AS BIGINT) AS kmv_millis,
         |       CAST(MIN(nd) AS BIGINT) AS exact_nd
         |FROM r""".stripMargin
  )
}
