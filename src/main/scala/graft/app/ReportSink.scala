package graft.app

import graft.TableDef
import graft.operators.{Normalize, RenderQueries}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.io.Writer
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

/** S8/S9: the styled diff report and its timestamped filename.
  *
  * The reference renders one Excel block per changed table — an orange
  * table-name row, a green header row (`(diff)` + column names), then one
  * styled row per changed record with modified cells highlighted
  * (`cmd/dbdiff/main.go:157-254`). Excel is a driver-memory sink; the HTML
  * twin here keeps the exact information (status cell, per-cell `mod`
  * marking via `modified_columns`) while the per-row strings are computed
  * distributed ([[RenderQueries.htmlRows]], plain codegen projections).
  *
  * Two sinks share those rows:
  * - [[writeHtml]]: single styled file for the CLI, streamed through
  *   `toLocalIterator` — constant driver memory, any diff size (the
  *   reference materializes the whole workbook on the heap).
  * - [[writeDistributed]]: the 100 TB path — rendered rows land as a text
  *   dataset in the lake, one shard per partition, no driver involvement.
  */
object ReportSink {
  /** Default-name sentinel, `cmd/dbdiff/main.go:20` (xlsx → html). */
  val DefaultOutputName = "dbdiff_yyyymmdd_hhmmss.html"

  /** S9 (`main.go:273-282`): the sentinel becomes a timestamped name; an
    * explicit name passes through. */
  def generateOutFilename(specified: String, now: LocalDateTime): String =
    if (specified == DefaultOutputName)
      "dbdiff_" + now.format(DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss")) + ".html"
    else specified

  private val style =
    """<style>
      |table{border-collapse:collapse}td,th{border:1px solid #000;padding:2px 6px}
      |td.mod{background:#ff0;border:1px solid #f00}
      |th{background:#92d050}.tname{background:#ffc000}
      |</style>""".stripMargin

  /** Deterministic row order for the file: by key, BEFORE before AFTER for
    * an UPDATED pair (the reference emits before-then-after,
    * `extract_data.go:226-228`). */
  private def ordered(htmlRows: DataFrame): DataFrame =
    htmlRows.orderBy(col(Normalize.KeyCol), col("side").desc)

  /** Writes one styled report. `sections` pairs each changed table with its
    * rendered rows ([[RenderQueries.htmlRows]] output); tables with no
    * changes are skipped like the reference (`main.go:160-163`). Returns the
    * number of data rows written. */
  def writeHtml(sections: Seq[(TableDef, DataFrame)], out: Writer): Long = {
    var written = 0L
    out.write(s"<html><head>$style</head><body>\n")
    sections.foreach { case (t, rows) =>
      var headerDone = false
      val it = ordered(rows).select(col("tr")).toLocalIterator()
      while (it.hasNext) {
        if (!headerDone) {
          // table-name + header rows (`main.go:167-196`)
          out.write(s"""<table>\n<tr><td class="tname">TableName</td><td>${t.name}</td></tr>\n""")
          out.write(t.cols.map(c => s"<th>$c</th>").mkString("<tr><th>(diff)</th>", "", "</tr>\n"))
          headerDone = true
        }
        out.write(it.next().getString(0))
        out.write("\n")
        written += 1
      }
      if (headerDone) out.write("</table>\n<br/><br/>\n")
    }
    out.write("</body></html>\n")
    written
  }

  /** Scale path: rendered rows as a distributed text dataset. */
  def writeDistributed(htmlRows: DataFrame, dir: String): Unit =
    htmlRows.select(col("tr")).write.mode("overwrite").text(dir)

  /** S7 console sink: streams renderer lines to `out`, at most `maxRows`
    * (the reference prints every changed row, `main.go:204-231` — unbounded
    * stdout is exactly what breaks at scale, so the cap is explicit). */
  def printConsole(lines: DataFrame, out: String => Unit, maxRows: Int): Long = {
    val it = ordered(lines.withColumnRenamed("line", "tr")).select(col("tr")).toLocalIterator()
    var n = 0L
    while (it.hasNext && n < maxRows) { out(it.next().getString(0)); n += 1 }
    if (it.hasNext) out(s"... (truncated at $maxRows rows)")
    n
  }
}
