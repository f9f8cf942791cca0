package graft

import org.apache.spark.sql.functions._

/** Scratch measurement probe (r14) — deleted before round close. */
object TmpProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.create("32", "graft-probe")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    import spark.implicits._
    val t = graft.Tables.orders
    val bn = graft.operators.Normalize.withKey(
      graft.Tables.load(spark, sfDir, t.name), t.pk)
    val an = graft.operators.Normalize.withKey(
      graft.operators.DiffQueries.after(spark, sfDir, t), t.pk)
    for (i <- 1 to 2) {
      val root = java.nio.file.Files.createTempDirectory("graft_probe_cdc_").toString
      val (srcDir, outDir, ckptDir) = (s"$root/changelog", s"$root/events", s"$root/ckpt")
      val key = col(graft.operators.Normalize.KeyCol).as("key")
      val colsArr = array(t.cols.map(col): _*)
      time(s"write before changelog $i")(
        bn.select(key, colsArr.as("cols"), lit(false).as("tombstone"))
          .write.mode("overwrite").parquet(srcDir))
      val schema = spark.read.parquet(srcDir).schema
      val q = graft.streaming.StreamingDiff.diffStream(
          spark.readStream.schema(schema).parquet(srcDir)
            .as[graft.streaming.StreamingDiff.KeyedRow], t.cols)
        .toDF()
        .writeStream.outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
        .format("parquet").option("path", outDir)
        .option("checkpointLocation", ckptDir)
        .start()
      time(s"phase1 drain $i")(q.processAllAvailable())
      time(s"phase2 write $i")(
        an.select(key, colsArr.as("cols"), lit(false).as("tombstone"))
          .union(bn.select(col(graft.operators.Normalize.KeyCol))
            .join(an.select(col(graft.operators.Normalize.KeyCol)),
              Seq(graft.operators.Normalize.KeyCol), "left_anti")
            .select(key, lit(null).cast(schema("cols").dataType).as("cols"),
              lit(true).as("tombstone")))
          .write.mode("append").parquet(srcDir))
      time(s"phase2 drain $i")(q.processAllAvailable())
      q.stop()
      time(s"readback counts $i")(
        spark.read.parquet(outDir)
          .groupBy(col("diff_status"), col("side"))
          .agg(count(lit(1)).as("n_events")).collect())
      // floor probe: the same changelog through a STATELESS stream
      val root2 = java.nio.file.Files.createTempDirectory("graft_probe_sl_").toString
      val q2 = spark.readStream.schema(schema).parquet(srcDir)
        .select(col("key"), col("cols"), col("tombstone"))
        .writeStream.outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
        .format("parquet").option("path", s"$root2/out")
        .option("checkpointLocation", s"$root2/ckpt").start()
      time(s"stateless drain $i")(q2.processAllAvailable())
      q2.stop()
      // floor probe 2: stateful via groupByKey but NO sink payload work —
      // same state machine, count-only output
      val root3 = java.nio.file.Files.createTempDirectory("graft_probe_st_").toString
      val q3 = graft.streaming.StreamingDiff.diffStream(
          spark.readStream.schema(schema).parquet(srcDir)
            .as[graft.streaming.StreamingDiff.KeyedRow], t.cols)
        .select(col("key"))
        .writeStream.outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
        .format("parquet").option("path", s"$root3/out")
        .option("checkpointLocation", s"$root3/ckpt").start()
      time(s"stateful keyonly drain $i")(q3.processAllAvailable())
      q3.stop()
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(root)).iterator().asScala
        .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
    spark.stop()
  }
}
