package graft

import graft.sources.JdbcSnapshots
import org.scalatest.funsuite.AnyFunSuite

/** Golden snapshots of the exact SQL the three live dialects receive.
  *
  * `DialectSqlSpec` property-tests CONSTRUCTION (quoting, balance,
  * schema-scoping hold for any identifier); this spec pins the literal
  * TEXT, so an accidental edit to any dialect branch diffs loudly against
  * a human-reviewed fixture instead of sliding through as long as the
  * properties still hold. These strings were verified against the
  * reference's queries (`dbutil.go:9-38` table list, `dbutil.go:41-114`
  * PKs, `extract_data.go:29-42` snapshot) — same catalog sources, same
  * predicates, same ordering columns; formatting (margins, aliases) is
  * ours. The dialects themselves cannot be executed in this container, so
  * verbatim text is the strongest available gate.
  */
class GoldenSqlSpec extends AnyFunSuite {

  test("golden: postgresql catalog + PK + snapshot") {
    assert(JdbcSnapshots.tableListSql("postgresql", "sch") ==
      "SELECT relname AS table_name FROM pg_stat_user_tables ORDER BY relname")
    assert(JdbcSnapshots.pkSql("postgresql", "orders", "sch") ==
      """SELECT kcu.column_name
        |FROM information_schema.table_constraints tc
        |JOIN information_schema.constraint_column_usage ccu
        |  ON tc.constraint_catalog = ccu.constraint_catalog
        | AND tc.constraint_schema = ccu.constraint_schema
        | AND tc.constraint_name = ccu.constraint_name
        |JOIN information_schema.key_column_usage kcu
        |  ON tc.constraint_catalog = kcu.constraint_catalog
        | AND tc.constraint_schema = kcu.constraint_schema
        | AND tc.constraint_name = kcu.constraint_name
        | AND ccu.column_name = kcu.column_name
        |WHERE tc.constraint_type = 'PRIMARY KEY' AND tc.table_name = 'orders'
        |ORDER BY kcu.ordinal_position""".stripMargin)
    assert(JdbcSnapshots.qualifiedTable("sch.", "orders") == "sch.orders")
    assert(JdbcSnapshots.jdbcUrl("postgresql", "db1", "5432", "corp") ==
      "jdbc:postgresql://db1:5432/corp")
  }

  test("golden: mysql catalog + PK + snapshot") {
    assert(JdbcSnapshots.tableListSql("mysql", "sch") ==
      "SELECT table_name FROM information_schema.tables " +
        "WHERE table_schema = database() ORDER BY table_name")
    assert(JdbcSnapshots.pkSql("mysql", "orders", "sch") ==
      """SELECT column_name FROM information_schema.columns
        |WHERE table_schema = database() AND table_name = 'orders'
        |  AND column_key = 'PRI' ORDER BY ordinal_position""".stripMargin)
    assert(JdbcSnapshots.qualifiedTable("", "orders") == "orders")
    assert(JdbcSnapshots.jdbcUrl("mysql", "db1", "3306", "corp") ==
      "jdbc:mysql://db1:3306/corp")
  }

  test("golden: mssql catalog + PK + snapshot") {
    assert(JdbcSnapshots.tableListSql("mssql", "sch") ==
      "SELECT name AS table_name FROM sys.objects WHERE type = 'U' ORDER BY name")
    assert(JdbcSnapshots.pkSql("mssql", "orders", "sch") ==
      """SELECT kcu.column_name
        |FROM information_schema.table_constraints tc
        |JOIN information_schema.key_column_usage kcu
        |  ON tc.constraint_catalog = kcu.constraint_catalog
        | AND tc.constraint_schema = kcu.constraint_schema
        | AND tc.constraint_name = kcu.constraint_name
        |WHERE tc.constraint_type = 'PRIMARY KEY' AND tc.table_name = 'orders'
        |ORDER BY kcu.ordinal_position""".stripMargin)
    assert(JdbcSnapshots.qualifiedTable("dbo.", "orders") == "dbo.orders")
    assert(JdbcSnapshots.jdbcUrl("mssql", "db1", "1433", "corp") ==
      "jdbc:sqlserver://db1:1433;databaseName=corp")
  }

  test("golden: escaped table name renders identically across dialects") {
    // one fixed hostile name, pinned verbatim — the property suite covers
    // the space; this is the eyeball-reviewable instance
    val sql = JdbcSnapshots.pkSql("postgresql", "o'r d.er", "sch")
    assert(sql.contains("tc.table_name = 'o''r d.er'"), sql)
  }
}
