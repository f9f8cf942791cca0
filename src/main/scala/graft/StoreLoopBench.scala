package graft

import graft.app.DbDiffApp
import graft.operators.DiffQueries

/** Application-loop timing for the bucketed snapshot store:
  * `runMain graft.StoreLoopBench <sfDir> [buckets] [iters]`.
  *
  * Runs the reference's standing before/after loop ([[DbDiffApp]]) twice
  * over lineitem — once plain (every iteration shuffles both sides of the
  * diff) and once in store mode (`storeBuckets` — every snapshot lands
  * hash-bucketed by `__key`, so each iteration's diff plans Exchange-free).
  * The source alternates base ↔ mutated between iterations, so every diff
  * sees the full mutation delta — the repeat-diff shape that amortizes the
  * bucketed write. Prints one JSON line with per-iteration seconds.
  */
object StoreLoopBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val buckets = if (args.length > 1) args(1).toInt else 32
    val iters = if (args.length > 2) args(2).toInt else 4
    val spark = GraftSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      "graft-storeloop")
    val t = Tables.lineitem
    var mutated = false
    val source = (td: TableDef) =>
      if (mutated) DiffQueries.after(spark, sfDir, td)
      else Tables.load(spark, sfDir, td.name)

    def loop(pin: Boolean, store: Int): (Double, Seq[Double]) = {
      mutated = false
      val t0 = System.nanoTime()
      val app = new DbDiffApp(spark, Seq(t), source, _ => (),
        maxConsoleRows = 0, pinSnapshots = pin, storeBuckets = store)
      val initSec = (System.nanoTime() - t0) / 1e9 // first snapshot (pin/store: a write)
      val secs = (1 to iters).map { _ =>
        mutated = !mutated // full mutation delta every iteration
        val s = System.nanoTime()
        app.iterate()
        (System.nanoTime() - s) / 1e9
      }
      (initSec, secs)
    }

    // plain = lazy frames (only valid for immutable sources); pinned = the
    // materialize-every-snapshot mode a LIVE source requires (the
    // reference's semantics) — the apples-to-apples baseline for the
    // store, which pays the same per-snapshot write but bucketed, buying
    // every diff back Exchange-free.
    val (plainInit, plainSecs) = loop(pin = false, store = 0)
    val (pinInit, pinSecs) = loop(pin = true, store = 0)
    val (storeInit, storeSecs) = loop(pin = false, store = buckets)
    def num(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def arr(vs: Seq[Double]) = vs.map(num).mkString("[", ",", "]")
    println(s"""{"metric":"store_loop_lineitem","sf":"$sfDir","buckets":$buckets,""" +
      s""""plain_init_sec":${num(plainInit)},"plain_iter_sec":${arr(plainSecs)},""" +
      s""""pin_init_sec":${num(pinInit)},"pin_iter_sec":${arr(pinSecs)},""" +
      s""""store_init_sec":${num(storeInit)},"store_iter_sec":${arr(storeSecs)}}""")
    spark.stop()
  }
}
