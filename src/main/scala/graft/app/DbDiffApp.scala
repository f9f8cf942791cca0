package graft.app

import graft.{TableDef, Tables}
import graft.operators.{BucketedSnapshots, Normalize, RenderQueries, SnapshotDiff}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.io.{BufferedWriter, FileWriter}

/** The reference application's end-to-end loop (`cmd/dbdiff/main.go:23-98`):
  * collect a *before* snapshot of every table, wait for the operator to do
  * some work, collect *after*, extract + render the changes, then swap
  * `before = after` and go again.
  *
  * The reference holds both snapshots as driver-heap maps and diffs them
  * single-threaded — its ceiling is RAM on one machine. Here a "snapshot" is
  * a map of *lazy* DataFrames: nothing is read until the diff runs, the diff
  * itself is the distributed [[SnapshotDiff]] full-outer join, and the swap
  * is a map assignment. The only driver-side state is plan metadata.
  *
  * `source` abstracts "the live database" (`extract_data.go:19-95` scans):
  * it is re-invoked per snapshot, so whatever changed underneath (parquet
  * files rewritten, JDBC tables updated, or a test injecting mutation SQL)
  * is what the next snapshot sees.
  */
final class DbDiffApp(
    spark: SparkSession,
    tables: Seq[TableDef],
    source: TableDef => DataFrame,
    consoleOut: String => Unit = println,
    maxConsoleRows: Int = 200,
    pinSnapshots: Boolean = false,
    feedDir: String = "",
    merkleBuckets: Int = 0,
    storeBuckets: Int = 0) {

  import DbDiffApp.IterationResult

  // the bucketed store IS a pinned snapshot (and prunes per-bucket itself);
  // combining it with the other materialization modes would double-pay
  require(storeBuckets == 0 || (!pinSnapshots && merkleBuckets == 0),
    "storeBuckets is exclusive with pinSnapshots/merkleBuckets")

  /** Catalog-name prefix for this instance's bucketed generations. */
  private val storePrefix = s"graft_store_${DbDiffApp.instanceIds.incrementAndGet()}"

  /** One frame per table (S6). With `pinSnapshots` the frame is eagerly
    * MATERIALIZED to a per-snapshot parquet directory and read back: a lazy
    * frame over a MUTABLE source (a live JDBC table) would re-scan at diff
    * time and silently see the post-mutation state on both sides — the
    * reference materializes its before snapshot for exactly this reason
    * (`main.go:56-60`), into driver heap; here the pin is a distributed
    * write, so snapshot-at-time-T semantics hold without any driver
    * materialization. The app owns the pin directories, and [[iterate]]
    * deletes a snapshot's directory as soon as the swap retires it — a
    * long-running loop holds at most two pinned snapshots on disk (RDD
    * `checkpoint()` would instead accumulate files for the life of the
    * session). Leave false for immutable sources (parquet fixture dirs)
    * where pinning is pure cost. */
  private lazy val pinRoot: java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft_snapshots")
  private var pinSeq = 0

  private def snapshotAll(): (Map[String, DataFrame], Option[java.nio.file.Path]) =
    if (storeBuckets > 0) {
      // STORE MODE: the snapshot lands normalized + hash-bucketed + sorted
      // by `__key` ([[BucketedSnapshots.write]]) — the 100 TB layout where
      // every later diff against any generation of the same table
      // sort-merge-joins bucket-to-bucket with ZERO Exchange. The write is
      // the pin (snapshot-at-time-T semantics, like pinSnapshots) and the
      // co-location (no per-diff shuffle), bought once per snapshot.
      pinSeq += 1
      val dir = pinRoot.resolve(s"snap_$pinSeq")
      val m = tables.map { t =>
        BucketedSnapshots.write(source(t), t.pk, storeTable(t.name, pinSeq),
          dir.resolve(t.name).toString, storeBuckets)
        t.name -> spark.table(storeTable(t.name, pinSeq))
      }.toMap
      (m, Some(dir))
    } else if (!pinSnapshots) (tables.map(t => t.name -> source(t)).toMap, None)
    else {
      pinSeq += 1
      val dir = pinRoot.resolve(s"snap_$pinSeq")
      val m = tables.map { t =>
        val path = dir.resolve(t.name).toString
        source(t).write.parquet(path)
        t.name -> spark.read.parquet(path)
      }.toMap
      (m, Some(dir))
    }

  private def storeTable(name: String, gen: Int): String =
    s"${storePrefix}_${name}_gen$gen"

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(p)) {
      // Files.walk holds open directory handles — close the stream before
      // deleting, or the long-running loop leaks one fd per iteration
      val s = java.nio.file.Files.walk(p)
      val all = try s.iterator().asScala.toSeq finally s.close()
      all.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  /** Total record count across tables — the reference prints this per
    * snapshot (`main.go:59,76`). One distributed count per table, unioned
    * into a single job; no rows reach the driver. */
  def totalCount(snap: Map[String, DataFrame]): Long =
    snap.values.map(_.agg(count(lit(1)).as("n"))).reduce(_.unionAll(_))
      .agg(sum(col("n")).as("total")).head().getLong(0)

  private var beforePin: Option[java.nio.file.Path] = None
  private var before: Map[String, DataFrame] = {
    val (m, pin) = snapshotAll(); beforePin = pin; m
  }
  private var beforeGen: Int = pinSeq

  /** Physical plans of the most recent iteration's diffs (store mode only)
    * — lets the spec machine-assert the Exchange-free shape end to end. */
  private[graft] var lastDiffPlans: Map[String, String] = Map.empty

  /** Runs one BEFORE→AFTER→diff→report→swap iteration. Writes the styled
    * HTML report to `outName` (empty = skip file), prints console diff lines,
    * returns per-table changed-key counts. */
  private var iterSeq = 0

  def iterate(outName: String = ""): IterationResult = {
    iterSeq += 1
    val (after, afterPin) = snapshotAll()

    // one-winner mode: the reference keeps one map entry per key, so its
    // loop's diff(A, A) = ∅ holds even for duplicate-PK tables — ours must too.
    // With merkleBuckets > 0 each table diffs behind the bucket-checksum
    // prune ([[SnapshotDiff.diffOneWinnerPruned]]): a mostly-unchanged lake
    // re-joins only its dirty buckets each cycle — the repeat-diff economics
    // a standing loop actually needs (losslessness pinned by spec).
    val diffs: Seq[(TableDef, DataFrame)] = tables.map { t =>
      t -> (if (storeBuckets > 0)
        // both generations arrive hash-bucketed + sorted by `__key`, so the
        // one-winner dedups and the full-outer join all plan with zero
        // Exchange — the repeat-diff economics the standing loop needs
        SnapshotDiff.diffNormalized(
          SnapshotDiff.oneRowPerKey(before(t.name)),
          SnapshotDiff.oneRowPerKey(after(t.name)))
      else if (merkleBuckets > 0)
        // the Eager variant: dirty buckets land on the driver (≤ merkleBuckets
        // longs) and prune via InSet — a standing loop that never clears the
        // Spark cache must not accumulate persisted frames per iteration
        SnapshotDiff.diffOneWinnerPrunedEager(before(t.name), after(t.name), t.pk, merkleBuckets)
      else SnapshotDiff.diffOneWinner(before(t.name), after(t.name), t.pk))
    }
    if (storeBuckets > 0)
      lastDiffPlans = diffs.map { case (t, d) =>
        t.name -> d.queryExecution.executedPlan.toString
      }.toMap

    // console renderer (S7) — reference prints while building the workbook
    var changed = Map.empty[String, Long]
    diffs.foreach { case (t, d) =>
      val n = ReportSink.printConsole(
        RenderQueries.consoleLines(d, t.cols), consoleOut, maxConsoleRows)
      if (n > 0) consoleOut(s"===${t.name}=== ($n rows shown)")
      changed += t.name -> d.select(col(Normalize.KeyCol)).distinct().count()
    }

    // change-feed sink: the iteration's whole change set as ONE fixed-width
    // parquet stream (table, key, status, modified columns, side, md5 row
    // fingerprint) — what a downstream CDC consumer tails, next to the
    // human-facing console/HTML sinks. Feed width is schema-independent,
    // so one sink serves every table at any width.
    val feedPath = if (feedDir.nonEmpty) {
      val p = s"$feedDir/iter_$iterSeq"
      diffs.map { case (t, d) => SnapshotDiff.feed(d, t.name, t.cols) }
        .reduce(_.unionByName(_))
        .write.mode("overwrite").parquet(p)
      Some(p)
    } else None

    // styled report (S8) for tables with changes: `-o x.xlsx` selects the
    // reference's actual workbook format, anything else the HTML twin
    val reportPath = if (outName.nonEmpty) {
      if (outName.endsWith(".xlsx")) {
        val sections = diffs.collect { case (t, d) if changed(t.name) > 0 =>
          t -> RenderQueries.xlsxCells(d, t.cols)
        }
        val os = new java.io.BufferedOutputStream(new java.io.FileOutputStream(outName))
        try ReportSink.writeXlsx(sections, os) finally os.close()
      } else {
        val sections = diffs.collect { case (t, d) if changed(t.name) > 0 =>
          t -> RenderQueries.htmlRows(d, t.cols)
        }
        val w = new BufferedWriter(new FileWriter(outName))
        try ReportSink.writeHtml(sections, w) finally w.close()
      }
      Some(outName)
    } else None

    before = after // the swap, `main.go:83`
    // every action on the retired snapshot has run by now (console lines,
    // changed counts, report rows) — its pin directory is dead; delete it so
    // a long-running loop holds at most two pinned snapshots on disk
    if (storeBuckets > 0) {
      tables.foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS ${storeTable(t.name, beforeGen)}"))
      beforeGen = pinSeq
    }
    beforePin.foreach(deleteRecursively)
    beforePin = afterPin
    // same discipline for executor storage: any cache a diff variant
    // registered this iteration is released before the next one starts
    graft.CacheScope.releaseAll()
    IterationResult(changed, reportPath, feedPath)
  }
}

object DbDiffApp {
  private val instanceIds = new java.util.concurrent.atomic.AtomicInteger(0)

  final case class IterationResult(changedKeys: Map[String, Long],
      reportPath: Option[String], feedPath: Option[String] = None) {
    def totalChanged: Long = changedKeys.values.sum
  }

  /** Source over a parquet table directory (the fixture layout). */
  def parquetSource(spark: SparkSession, dir: String): TableDef => DataFrame =
    t => Tables.load(spark, dir, t.name)

  /** Source over a live JDBC database — the reference's actual deployment
    * shape (`db_impl.go:20-61`): each snapshot re-scans the table, so
    * whatever the operator changed in the database between iterations is
    * what the next diff sees. */
  def jdbcSource(spark: SparkSession, url: String, schema: String,
      props: Map[String, String] = Map.empty): TableDef => DataFrame =
    t => graft.sources.JdbcSnapshots.snapshot(
      spark, url, graft.sources.JdbcSnapshots.qualifiedTable(schema, t.name),
      None, None, 1, props)

  /** Catalog-driven table discovery over JDBC (S3/S4): table list + PKs
    * from the live catalog, column lists from the scan schema, and the
    * reference's keyless fallback (S5, `dbutil.go:136-141`) — a table
    * without a PK keys on all its columns. */
  def jdbcTables(spark: SparkSession, dialect: String, url: String, schema: String,
      props: Map[String, String] = Map.empty): Seq[TableDef] =
    graft.sources.JdbcSnapshots.catalog(spark, dialect, url, schema, props).map {
      case (name, pks) =>
        val cols = graft.sources.JdbcSnapshots
          .snapshot(spark, url,
            graft.sources.JdbcSnapshots.qualifiedTable(schema, name),
            None, None, 1, props)
          .columns.toSeq
        TableDef(name, cols, if (pks.nonEmpty) pks else cols)
    }
}
