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
    // task-metrics tap: spill and shuffle bytes per timed run, so a slow
    // reading carries its own explanation (spill vs environment) — the
    // same counters the Spark UI's stage page aggregates
    val mem = new java.util.concurrent.atomic.AtomicLong
    val disk = new java.util.concurrent.atomic.AtomicLong
    val sw = new java.util.concurrent.atomic.AtomicLong
    val sr = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          mem.addAndGet(m.memoryBytesSpilled)
          disk.addAndGet(m.diskBytesSpilled)
          sw.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          sr.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        }
      }
    })
    def mb(a: java.util.concurrent.atomic.AtomicLong): String =
      String.format(java.util.Locale.ROOT, "%.1f", Double.box(a.get / 1e6))
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to n).map { i =>
        CacheScope.releaseAll()
        spark.catalog.clearCache()
        Seq(mem, disk, sw, sr).foreach(_.set(0L))
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val t = (System.nanoTime() - t0) / 1e9
        // listener events drain asynchronously; settle before reading
        Thread.sleep(500)
        println(s"[metrics] $name run$i: spill_mem_mb=${mb(mem)} " +
          s"spill_disk_mb=${mb(disk)} shuffle_write_mb=${mb(sw)} " +
          s"shuffle_read_mb=${mb(sr)}")
        t
      }
      println(s"[benchone] $name: " +
        times.map(t => String.format(java.util.Locale.ROOT, "%.3f", Double.box(t))).mkString(" "))
    }
    CacheScope.releaseSession() // drop the standing-index tier at session end
    spark.stop()
  }
}
