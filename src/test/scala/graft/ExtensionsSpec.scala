package graft

import org.apache.spark.sql.SparkSession

/** The SQL function surface installed by [[GraftExtensions]]. */
class ExtensionsSpec extends SparkTestBase {
  test("qdot/qnormsq are callable from SQL via extensions") {
    val shared = spark // force shared session first
    // build a sibling session (same SparkContext, fresh session state) so
    // withExtensions actually applies instead of getOrCreate returning the
    // shared session
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      import s.implicits._
      Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("a", "b").createOrReplaceTempView("v")
      val r = s.sql("SELECT qdot(a, b) AS d, qnormsq(a) AS n FROM v").collect().head
      assert(r.getLong(0) == 1000000L * 3000000L + 2000000L * 4000000L)
      assert(r.getLong(1) == 1000000L * 1000000L + 2000000L * 2000000L)

      // the KMV sketch aggregate from plain SQL: 3 distinct of 4 rows,
      // below k → exact count in milli-units
      (1 to 4).map(i => (if (i == 4) "x1" else s"x$i")).toDF("x")
        .createOrReplaceTempView("kv")
      val k = s.sql("SELECT kmv_distinct(x, 16) AS nd FROM kv").collect().head
      assert(k.getLong(0) == 3000L)

      // the bottom-k sample aggregate from plain SQL: n < k → the exact
      // sorted value set comes back
      Seq((3.0, "a"), (1.0, "b"), (2.0, "c")).toDF("v", "id")
        .createOrReplaceTempView("sv")
      val b = s.sql("SELECT bottomk_sample(v, id, 16) AS samp FROM sv").collect().head
      assert(b.getSeq[Double](0) == Seq(1.0, 2.0, 3.0))
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
