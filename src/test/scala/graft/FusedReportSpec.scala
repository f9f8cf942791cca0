package graft

import graft.operators.{DiffQueries, SnapshotDiff}
import org.apache.spark.sql.functions._

/** The fused (join-free) multi-table report must equal the per-table
  * join-based statusCounts — including on lineitem, whose duplicate PKs
  * exercise the fingerprint-multiset argument in the fusedReport scaladoc
  * (min fp ≠ max fp ⟺ some before×after pairing differs). */
class FusedReportSpec extends SparkTestBase {

  test("fusedReport equals per-table statusCounts, duplicate keys included") {
    val tables = Seq(Tables.lineitem, Tables.nation, Tables.documents)
    val fused = SnapshotDiff.fusedReport(tables.map { t =>
      (t.name, Tables.load(spark, Sf, t.name), DiffQueries.after(spark, Sf, t), t.pk)
    }).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

    val perTable = tables.flatMap { t =>
      SnapshotDiff.statusCounts(
          Tables.load(spark, Sf, t.name), DiffQueries.after(spark, Sf, t), t.pk)
        .collect()
        .map(r => (t.name, r.getString(0)) -> r.getLong(1))
    }.toMap

    assert(fused == perTable, s"fused=$fused vs perTable=$perTable")
    // sanity: the duplicate-PK table produced every status
    assert(Seq("INSERTED", "DELETED", "UPDATED").forall(s => fused.contains(("lineitem", s))))
  }
}
