package graft

import graft.operators.SketchQueries

/** Count-Min frequency sketch: engine output checked EXACTLY against a
  * driver-side replay of the same d×w counter construction on the same
  * fixture tokens, plus the one-sided-error invariant (est ≥ exact). */
class CmsSketchSpec extends SparkTestBase {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def bucket(j: Int, term: String): Long =
    java.lang.Long.parseLong(md5hex(s"$j:$term").take(15), 16) % SketchQueries.CmsW

  test("CMS estimates equal a driver-side replay and never undercount") {
    val got = SparkEntry.queries("sketch_cms_terms")(spark, Sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.size == SketchQueries.CmsProbes)

    // replay: same tokenization, same md5 buckets, same min-over-rows read
    val toks = Tables.load(spark, Sf, "documents")
      .select("text").collect().map(_.getString(0))
      .flatMap(_.split(" ").filter(_.nonEmpty))
    val counters = new scala.collection.mutable.HashMap[(Int, Long), Long]()
    for (t <- toks; j <- 0 until SketchQueries.CmsD)
      counters((j, bucket(j, t))) = counters.getOrElse((j, bucket(j, t)), 0L) + 1L
    val exact = toks.groupBy(identity).map { case (t, os) => t -> os.length.toLong }
    val probes = exact.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(SketchQueries.CmsProbes)
    val want = probes.map { case (t, c) =>
      t -> ((c, (0 until SketchQueries.CmsD).map(j => counters((j, bucket(j, t)))).min))
    }.toMap
    assert(got == want, s"engine=$got replay=$want")
    got.values.foreach { case (ex, est) => assert(est >= ex) }
  }
}
