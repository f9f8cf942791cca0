package graft

/** Developer tool: time individual queries by name without the full Bench
  * protocol. `runMain graft.BenchOne <sfDir> <n> <name> [name...]` runs each
  * named query n times (cache cleared between runs) and prints per-attempt
  * seconds — for isolating whether a slow bench line is plan cost or the
  * container's stall waves (see Bench's scaladoc).
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.create(cpus, "graft-benchone")
    println(s"[preflight] ${Preflight.probeJson(sfDir)}")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to n).map { _ =>
        CacheScope.releaseAll()
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(s"[benchone] $name: " +
        times.map(t => String.format(java.util.Locale.ROOT, "%.3f", Double.box(t))).mkString(" "))
    }
    CacheScope.releaseSession() // drop the standing-index tier at session end
    spark.stop()
  }
}
