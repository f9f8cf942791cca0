package graft

import graft.operators.SnapshotDiff
import graft.sources.JdbcSnapshots
import org.apache.spark.sql.functions._

/** Executes the JDBC source plumbing (SURVEY §2 S2/J2/F4) against an
  * embedded Derby database — the one dialect that can run inside this
  * container. The production dialects' information_schema SQL can't execute
  * here (no live PostgreSQL/MySQL/SQL Server), but every code path around
  * it does: connection via `spark.read.format("jdbc")`, a real catalog
  * query through the `query` option, driver-metadata PK discovery with
  * KEY_SEQ ordering, the range-partitioned snapshot scan, and the full
  * normalize→diff pipeline over JDBC-sourced frames. */
class DerbyJdbcSpec extends SparkTestBase {

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private lazy val seeded: Unit = {
    System.setProperty("derby.system.home", "/tmp/derby")
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE ITEMS_BEFORE (ID INT PRIMARY KEY, NAME VARCHAR(50), VAL INT)")
      st.execute("CREATE TABLE ITEMS_AFTER (ID INT PRIMARY KEY, NAME VARCHAR(50), VAL INT)")
      // composite PK declared (B, A): KEY_SEQ must preserve that order
      st.execute("CREATE TABLE PAIRS (A INT NOT NULL, B INT NOT NULL, C VARCHAR(10), PRIMARY KEY (B, A))")
      (1 to 100).foreach { i =>
        st.execute(s"INSERT INTO ITEMS_BEFORE VALUES ($i, 'item_$i', ${i * 10})")
      }
      // after = before with id 7 modified, id 13 deleted, id 101 inserted
      (1 to 101).filter(_ != 13).foreach { i =>
        val v = if (i == 7) 9999 else i * 10
        st.execute(s"INSERT INTO ITEMS_AFTER VALUES ($i, 'item_$i', $v)")
      }
      st.close()
    } finally conn.close()
  }

  test("jdbcUrl builds the reference's connection-string shapes") {
    assert(JdbcSnapshots.jdbcUrl("postgresql", "h", "5432", "db") == "jdbc:postgresql://h:5432/db")
    assert(JdbcSnapshots.jdbcUrl("mysql", "h", "3306", "db") == "jdbc:mysql://h:3306/db")
    assert(JdbcSnapshots.jdbcUrl("mssql", "h", "1433", "db") == "jdbc:sqlserver://h:1433;databaseName=db")
    assert(JdbcSnapshots.jdbcUrl("derby", "", "", "memory:x") == "jdbc:derby:memory:x")
    intercept[IllegalArgumentException](JdbcSnapshots.jdbcUrl("oracle", "h", "1", "db"))
  }

  test("catalog: table list via SYS catalog query + PKs via driver metadata") {
    seeded
    val cat = JdbcSnapshots.catalog(spark, "derby", url, "APP")
    assert(cat.map(_._1) == Seq("ITEMS_AFTER", "ITEMS_BEFORE", "PAIRS"))
    assert(cat.toMap.apply("ITEMS_BEFORE") == Seq("ID"))
    // composite key order comes from KEY_SEQ, not column position
    assert(cat.toMap.apply("PAIRS") == Seq("B", "A"))
  }

  test("range-partitioned snapshot scan produces the requested splits") {
    seeded
    val df = JdbcSnapshots.snapshot(spark, url, "APP.ITEMS_BEFORE",
      Some("ID"), Some((1L, 101L)), numPartitions = 4)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 100)
    assert(df.agg(sum(col("VAL"))).head().getLong(0) == (1 to 100).map(_ * 10).sum)
  }

  test("full diff over JDBC-sourced snapshots") {
    seeded
    val before = JdbcSnapshots.snapshot(spark, url, "APP.ITEMS_BEFORE", None, None, 1)
    val after = JdbcSnapshots.snapshot(spark, url, "APP.ITEMS_AFTER", None, None, 1)
    val pk = JdbcSnapshots.pksViaMetadata(url, "APP", "ITEMS_BEFORE")

    val counts = SnapshotDiff.statusCounts(before, after, pk)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map(
      SnapshotDiff.Inserted -> 1L, SnapshotDiff.Deleted -> 1L, SnapshotDiff.Updated -> 1L))

    val d = SnapshotDiff.diff(before, after, pk)
    val updated = d.filter(col("diff_status") === SnapshotDiff.Updated)
      .orderBy(col("side")).collect()
    assert(updated.length == 2) // before row then after row
    assert(updated.forall(_.getAs[String]("modified_columns") == "VAL"))
    assert(d.filter(col("diff_status") === SnapshotDiff.Inserted)
      .head().getAs[String]("ID") == "101")
  }
}
