package graft

import graft.app.{DbDiffApp, DbDiffConfig, ReportSink}
import graft.operators.Mutations
import org.apache.spark.sql.DataFrame

import java.nio.file.{Files, Paths}
import java.time.LocalDateTime

/** End-to-end parity with the reference application loop
  * (`cmd/dbdiff/main.go:23-98`): config → snapshot → operations → diff →
  * console + styled report → swap → next iteration sees no changes. */
class DbDiffAppSpec extends SparkTestBase {

  test("S1: parses the reference's normal config shape") {
    val c = DbDiffConfig.parse(
      """db:
        |  type: postgresql
        |  host: localhost
        |  port: 5432
        |  user: user1
        |  password: pswd2
        |  name: dbname
        |  schema: schema.
        |""".stripMargin)
    assert(c.db.dbType == "postgresql")
    assert(c.db.host == "localhost")
    assert(c.db.port == "5432")
    assert(c.db.user == "user1")
    assert(c.db.password == "pswd2")
    assert(c.db.name == "dbname")
    assert(c.db.schema == "schema.")
  }

  test("S1: rejects the reference's invalid config shape") {
    intercept[IllegalArgumentException] {
      DbDiffConfig.parse("schema.\ntest\naaaa\nddd\n")
    }
  }

  test("S1: comments, quoted hashes, and mid-word apostrophes parse like YAML") {
    val c = DbDiffConfig.parse(
      """db:
        |  type: postgresql # trailing comment stripped
        |  password: "p#ss"
        |  user: dont'tell # comment after a mid-word apostrophe
        |  name: 'o#brien'
        |""".stripMargin)
    assert(c.db.dbType == "postgresql")
    assert(c.db.password == "p#ss")   // '#' inside quotes kept
    assert(c.db.user == "dont'tell")  // apostrophe is plain text, comment gone
    assert(c.db.name == "o#brien")    // single-quoted '#' kept
  }

  test("S9: timestamped default filename; explicit name passes through") {
    val t = LocalDateTime.of(2026, 8, 12, 13, 4, 5)
    assert(ReportSink.generateOutFilename(ReportSink.DefaultOutputName, t)
      == "dbdiff_20260812_130405.html")
    assert(ReportSink.generateOutFilename("x.html", t) == "x.html")
  }

  test("loop twice with swap: first iteration reports, second is empty") {
    val tables = Seq(Tables.region, Tables.customer)
    var mutated = false
    val source = (t: TableDef) => {
      val base = Tables.load(spark, Sf, t.name)
      if (mutated) {
        base.createOrReplaceTempView(t.name)
        spark.sql(Mutations.afterSql(t.name))
      } else base
    }

    val console = scala.collection.mutable.ArrayBuffer.empty[String]
    val app = new DbDiffApp(spark, tables, source, console.append(_), maxConsoleRows = 10000)

    assert(app.totalCount(tables.map(t => t.name -> source(t)).toMap) > 0)

    // iteration 1: the "user operations" happen, then the diff sees them
    mutated = true
    val out1 = Files.createTempFile("dbdiff", ".html").toString
    val r1 = app.iterate(out1)
    assert(r1.totalChanged > 0)
    assert(r1.changedKeys.keySet == Set("region", "customer"))

    // console renderer: reference label widths, byte for byte (main.go:204-231)
    assert(console.exists(_.startsWith("INSERTED        : (")))
    assert(console.exists(_.startsWith("DELETED         : (")))
    assert(console.exists(_.startsWith("UPDATED[Before] : (")))
    assert(console.exists(_.startsWith("UPDATED[After ] : (")))
    // row debug string shape `([col:val]...)` (extract_data.go:135-147)
    assert(console.exists(_.contains("[r_regionkey:")))

    // styled report: section per changed table, modified cells marked
    val html1 = Files.readString(Paths.get(out1))
    assert(html1.contains("<td>region</td>") && html1.contains("<td>customer</td>"))
    assert(html1.contains("<td class=\"mod\">"))
    assert(html1.contains("<th>(diff)</th>"))
    assert(html1.contains("UPD BEFORE") && html1.contains("UPD  AFTER"))

    // iteration 2: nothing changed since the swap → empty diff, empty report
    console.clear()
    val out2 = Files.createTempFile("dbdiff", ".html").toString
    val r2 = app.iterate(out2)
    assert(r2.totalChanged == 0)
    assert(console.isEmpty)
    val html2 = Files.readString(Paths.get(out2))
    assert(!html2.contains("<table>"))
  }

  test("bucketed store mode: loop equals the plain loop and diffs Exchange-free") {
    val tables = Seq(Tables.region, Tables.customer)
    def mkSource(flag: () => Boolean): TableDef => DataFrame = t => {
      val base = Tables.load(spark, Sf, t.name)
      if (flag()) {
        base.createOrReplaceTempView(t.name)
        spark.sql(Mutations.afterSql(t.name))
      } else base
    }

    var mutP = false
    val consoleP = scala.collection.mutable.ArrayBuffer.empty[String]
    val plainApp = new DbDiffApp(spark, tables, mkSource(() => mutP),
      consoleP.append(_), maxConsoleRows = 10000)
    var mutS = false
    val consoleS = scala.collection.mutable.ArrayBuffer.empty[String]
    val storeApp = new DbDiffApp(spark, tables, mkSource(() => mutS),
      consoleS.append(_), maxConsoleRows = 10000, storeBuckets = 4)

    mutP = true; mutS = true
    val rP = plainApp.iterate()
    val rS = storeApp.iterate()
    // identical change sets AND identical console rendering, table by table
    assert(rS.changedKeys == rP.changedKeys && rS.totalChanged > 0)
    assert(consoleS.sorted == consoleP.sorted)
    // the store-mode diff (one-winner dedups + full-outer join) consumed
    // the bucketed layout: zero Exchange in every table's physical plan
    assert(storeApp.lastDiffPlans.keySet == Set("region", "customer"))
    storeApp.lastDiffPlans.foreach { case (t, plan) =>
      assert(!plan.contains("Exchange"), s"$t store-mode diff shuffles:\n$plan")
    }
    // iteration 2: nothing changed since the swap → empty diff in store
    // mode too (generation g diffs against generation g+1, both bucketed)
    consoleS.clear()
    val rS2 = storeApp.iterate()
    assert(rS2.totalChanged == 0 && consoleS.isEmpty)
  }

  test("S8: -o out.xlsx writes the reference's styled workbook (modified-cell runs)") {
    val tables = Seq(Tables.region, Tables.customer)
    var mutated = false
    val source = (t: TableDef) => {
      val base = Tables.load(spark, Sf, t.name)
      if (mutated) {
        base.createOrReplaceTempView(t.name)
        spark.sql(Mutations.afterSql(t.name))
      } else base
    }
    val app = new DbDiffApp(spark, tables, source, _ => (), maxConsoleRows = 0)
    mutated = true
    val out = Files.createTempFile("dbdiff", ".xlsx").toString
    val r = app.iterate(out)
    assert(r.totalChanged > 0 && r.reportPath.contains(out))

    // the workbook is a well-formed zip with every required OOXML part
    val zf = new java.util.zip.ZipFile(out)
    try {
      val names = {
        val e = zf.entries(); val b = Seq.newBuilder[String]
        while (e.hasMoreElements) b += e.nextElement().getName
        b.result().toSet
      }
      assert(Set("[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
        "xl/_rels/workbook.xml.rels", "xl/styles.xml",
        "xl/worksheets/sheet1.xml").subsetOf(names), names)
      def read(n: String): String =
        new String(zf.getInputStream(zf.getEntry(n)).readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
      // styles: the reference's fills — orange table-name, green header,
      // yellow modified (cmd/dbdiff/main.go:116-155)
      val styles = read("xl/styles.xml")
      assert(styles.contains("FFFFC000") && styles.contains("FF92D050") &&
        styles.contains("FFFFFF00") && styles.contains("FFFF0000"))
      val sheet = read("xl/worksheets/sheet1.xml")
      // table-name + header blocks per table, from B2 (column-A pad cell)
      assert(sheet.contains("<is><t>TableName</t></is>"))
      assert(sheet.contains("<is><t>region</t></is>") &&
        sheet.contains("<is><t>customer</t></is>"))
      assert(sheet.contains("s=\"2\"><is><t>(diff)</t></is>"))
      // data rows: status labels incl. the literal double space, and
      // MODIFIED-cell style runs (s="4") on updated rows only
      assert(sheet.contains("<is><t>UPD BEFORE</t></is>") &&
        sheet.contains("<is><t>UPD  AFTER</t></is>"))
      assert(sheet.contains("s=\"4\"><is><t>"))
      // unmodified cells ride the bordered style
      assert(sheet.contains("s=\"3\"><is><t>INSERTED</t></is>"))
      // XML must parse — a malformed sheet breaks every consumer
      javax.xml.parsers.DocumentBuilderFactory.newInstance()
        .newDocumentBuilder()
        .parse(new java.io.ByteArrayInputStream(
          sheet.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    } finally zf.close()
  }

  test("S10: viewer spawn builds the reference's command per OS, non-fatal on failure") {
    var launched = Seq.empty[String]
    val capture = (c: Seq[String]) => { launched = c }
    // the reference's two platforms, byte for byte (main.go:261-269)
    assert(ReportSink.openInViewer("r.xlsx", "mac os x", capture))
    assert(launched == Seq("/usr/bin/open", "r.xlsx"))
    assert(ReportSink.openInViewer("r.xlsx", "windows 11", capture))
    assert(launched == Seq("cmd", "/C", "r.xlsx"))
    // the linux extension
    assert(ReportSink.openInViewer("r.xlsx", "linux", capture))
    assert(launched == Seq("xdg-open", "r.xlsx"))
    // unknown platform: no spawn, no failure
    assert(!ReportSink.openInViewer("r.xlsx", "plan9", capture))
    // a failing launcher is contained (the reference log.Fatalf's here)
    assert(!ReportSink.openInViewer("r.xlsx", "linux",
      _ => throw new java.io.IOException("no viewer")))
  }

  test("change-feed sink: iteration writes one fixed-width feed; counts match the diffs") {
    val tables = Seq(Tables.region, Tables.customer)
    var mutated = false
    val source = (t: TableDef) => {
      val base = Tables.load(spark, Sf, t.name)
      if (mutated) {
        base.createOrReplaceTempView(t.name)
        spark.sql(Mutations.afterSql(t.name))
      } else base
    }
    val feedDir = Files.createTempDirectory("graft_feed").toString
    val app = new DbDiffApp(spark, tables, source, _ => (), feedDir = feedDir)

    mutated = true
    val r1 = app.iterate()
    assert(r1.feedPath.contains(s"$feedDir/iter_1"))
    val feed = spark.read.parquet(r1.feedPath.get)
    assert(feed.columns.toSeq ==
      Seq("table_name", "__key", "diff_status", "modified_columns", "side", "row_fp"))
    // one feed row per physical diff row (UPDATED keys contribute two)
    import org.apache.spark.sql.functions.col
    val perTable = feed.groupBy(col("table_name")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perTable.keySet == Set("region", "customer") && perTable.values.forall(_ > 0))
    // fingerprints are md5 hex — fixed width regardless of table schema
    assert(feed.select(col("row_fp")).collect().forall(_.getString(0).length == 32))

    // iteration 2: no changes → feed exists but is empty
    val r2 = app.iterate()
    assert(spark.read.parquet(r2.feedPath.get).isEmpty)
  }

  test("streaming feed consumer: status counts converge to the batch report") {
    import graft.operators.SnapshotDiff
    import graft.streaming.FeedConsumer
    import org.apache.spark.sql.functions.{col, lit}
    val tables = Seq(Tables.region, Tables.customer)
    var mutated = false
    val source = (t: TableDef) => {
      val base = Tables.load(spark, Sf, t.name)
      if (mutated) {
        base.createOrReplaceTempView(t.name)
        spark.sql(Mutations.afterSql(t.name))
      } else base
    }
    val feedDir = Files.createTempDirectory("graft_feed2").toString
    val app = new DbDiffApp(spark, tables, source, _ => (), feedDir = feedDir)
    mutated = true
    app.iterate() // writes iter_1
    app.iterate() // writes the empty iter_2

    val q = FeedConsumer.statusCounts(FeedConsumer.readFeed(spark, s"$feedDir/iter_*"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("graft_feedcounts").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("graft_feedcounts")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

    // batch oracle: one-winner statusCounts per table (the app's diff mode)
    val batch = tables.flatMap { t =>
      val before = Tables.load(spark, Sf, t.name)
      before.createOrReplaceTempView(t.name)
      val after = spark.sql(Mutations.afterSql(t.name))
      val d = SnapshotDiff.diffOneWinner(before, after, t.pk)
      d.groupBy(col("diff_status"))
        .agg(org.apache.spark.sql.functions.countDistinct(col("__key")).as("n"))
        .collect().map(r => (t.name, r.getString(0), r.getLong(1)))
    }.toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("UPDATED pair renders BEFORE above AFTER for the same key") {
    val t = Tables.region
    Tables.load(spark, Sf, t.name).createOrReplaceTempView(t.name)
    val after = spark.sql(Mutations.afterSql(t.name))
    val d = graft.operators.SnapshotDiff.diff(Tables.load(spark, Sf, t.name), after, t.pk)
    val lines = graft.operators.RenderQueries.consoleLines(d, t.cols)

    val sw = new java.io.StringWriter()
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    ReportSink.printConsole(lines, buf.append(_), 10000)
    sw.close()
    val upd = buf.filter(_.startsWith("UPDATED"))
    assert(upd.nonEmpty && upd.length % 2 == 0)
    upd.grouped(2).foreach { pair =>
      assert(pair(0).startsWith("UPDATED[Before] "))
      assert(pair(1).startsWith("UPDATED[After ] "))
    }
  }

  test("merkle-pruned app loop matches the plain loop's changed counts") {
    // lineitem included: duplicate PKs exercise prune+one-winner composition
    val tables = Seq(Tables.part, Tables.lineitem)
    var mutated = false
    val source = (t: TableDef) => {
      val base = Tables.load(spark, Sf, t.name)
      if (mutated) {
        base.createOrReplaceTempView(t.name)
        spark.sql(Mutations.afterSql(t.name))
      } else base
    }
    val plain = new DbDiffApp(spark, tables, source, _ => (), maxConsoleRows = 0)
    val pruned = new DbDiffApp(spark, tables, source, _ => (), maxConsoleRows = 0,
      merkleBuckets = 512)
    mutated = true
    val rPlain = plain.iterate()
    // reset both apps' before to the unmutated fixture for a fair comparison:
    // fresh pruned app sees the same before (sources are deterministic)
    assert(rPlain.totalChanged > 0)
    val rPruned = pruned.iterate()
    assert(rPruned.changedKeys == rPlain.changedKeys)
    // second iteration: no further mutation -> prune kills everything
    val r2 = pruned.iterate()
    assert(r2.totalChanged == 0)
  }
}
