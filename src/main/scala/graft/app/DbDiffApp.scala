package graft.app

import graft.{TableDef, Tables}
import graft.operators.{Normalize, RenderQueries, SnapshotDiff}
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
    maxConsoleRows: Int = 200) {

  import DbDiffApp.IterationResult

  /** One lazy frame per table (S6). */
  private def snapshotAll(): Map[String, DataFrame] =
    tables.map(t => t.name -> source(t)).toMap

  /** Total record count across tables — the reference prints this per
    * snapshot (`main.go:59,76`). One distributed count per table, unioned
    * into a single job; no rows reach the driver. */
  def totalCount(snap: Map[String, DataFrame]): Long =
    snap.values.map(_.agg(count(lit(1)).as("n"))).reduce(_.unionAll(_))
      .agg(sum(col("n")).as("total")).head().getLong(0)

  private var before: Map[String, DataFrame] = snapshotAll()

  /** Runs one BEFORE→AFTER→diff→report→swap iteration. Writes the styled
    * HTML report to `outName` (empty = skip file), prints console diff lines,
    * returns per-table changed-key counts. */
  def iterate(outName: String = ""): IterationResult = {
    val after = snapshotAll()

    // one-winner mode: the reference keeps one map entry per key, so its
    // loop's diff(A, A) = ∅ holds even for duplicate-PK tables — ours must too
    val diffs: Seq[(TableDef, DataFrame)] = tables.map { t =>
      t -> SnapshotDiff.diffOneWinner(before(t.name), after(t.name), t.pk)
    }

    // console renderer (S7) — reference prints while building the workbook
    var changed = Map.empty[String, Long]
    diffs.foreach { case (t, d) =>
      val n = ReportSink.printConsole(
        RenderQueries.consoleLines(d, t.cols), consoleOut, maxConsoleRows)
      if (n > 0) consoleOut(s"===${t.name}=== ($n rows shown)")
      changed += t.name -> d.select(col(Normalize.KeyCol)).distinct().count()
    }

    // styled report (S8) for tables with changes
    val reportPath = if (outName.nonEmpty) {
      val sections = diffs.collect { case (t, d) if changed(t.name) > 0 =>
        t -> RenderQueries.htmlRows(d, t.cols)
      }
      val w = new BufferedWriter(new FileWriter(outName))
      try ReportSink.writeHtml(sections, w) finally w.close()
      Some(outName)
    } else None

    before = after // the swap, `main.go:83`
    IterationResult(changed, reportPath)
  }
}

object DbDiffApp {
  final case class IterationResult(changedKeys: Map[String, Long], reportPath: Option[String]) {
    def totalChanged: Long = changedKeys.values.sum
  }

  /** Source over a parquet table directory (the fixture layout). */
  def parquetSource(spark: SparkSession, dir: String): TableDef => DataFrame =
    t => Tables.load(spark, dir, t.name)
}
