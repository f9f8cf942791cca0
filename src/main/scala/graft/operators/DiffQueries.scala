package graft.operators

import graft.{TableDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Harness registry for the snapshot-diff surface: one named query per
  * reference operator (SURVEY.md §2), each paired with generated DuckDB
  * oracle SQL in [[oracleSql]].
  */
object DiffQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Mutated "after" snapshot — executes the shared mutation SQL
    * ([[Mutations]]) over a temp view of the before parquet. */
  def after(spark: SparkSession, sfDir: String, t: TableDef): DataFrame = {
    Tables.load(spark, sfDir, t.name).createOrReplaceTempView(t.name)
    spark.sql(Mutations.afterSql(t.name))
  }

  private def diffQ(t: TableDef, pk: Seq[String]): Q = (spark, sfDir) => {
    val before = Tables.load(spark, sfDir, t.name)
    SnapshotDiff.diff(before, after(spark, sfDir, t), pk)
  }

  /** Flagship: composite-key diff of lineitem (SURVEY §7.2 step 1). */
  def flagship(spark: SparkSession, sfDir: String): DataFrame =
    diffQ(Tables.lineitem, Tables.lineitem.pk)(spark, sfDir)

  val queries: Map[String, Q] = {
    val perTable: Map[String, Q] = Tables.diffable.map { t =>
      s"diff_${t.name}" -> diffQ(t, t.pk)
    }.toMap

    perTable ++ Map[String, Q](
      // S5 fallback path: no PK → all columns form the key.
      "diff_region_keyless" -> diffQ(Tables.region, Tables.region.cols),
      // Property: diff(A, A) = ∅.
      "diff_identity_nation" -> ((spark, sfDir) => {
        val before = Tables.load(spark, sfDir, "nation")
        SnapshotDiff.diff(before, Tables.load(spark, sfDir, "nation"), Tables.nation.pk)
      }),
      // Multi-table change report (A-series aggregates over J1 output) —
      // all 9 tables fused into ONE fingerprint aggregation (no joins; see
      // SnapshotDiff.fusedReport for the scale argument).
      "diff_report" -> ((spark, sfDir) => {
        SnapshotDiff.fusedReport(Tables.diffable.map { t =>
          (t.name, Tables.load(spark, sfDir, t.name), after(spark, sfDir, t), t.pk)
        })
      }),
      // Reference map semantics (one deterministic winner per duplicate key,
      // extract_data.go:81) — the application-loop diff mode. lineitem is
      // the table with real duplicate PKs, so this exercises the dedup.
      "diff_lineitem_onewinner" -> ((spark, sfDir) => {
        val t = Tables.lineitem
        val before = Tables.load(spark, sfDir, t.name)
        SnapshotDiff.diffOneWinner(before, after(spark, sfDir, t), t.pk)
      }),
      // Property the app loop depends on: one-winner diff(A, A) = ∅ even
      // with duplicate keys (multiplicity diff is nonempty on lineitem).
      "diff_identity_onewinner" -> ((spark, sfDir) => {
        val t = Tables.lineitem
        SnapshotDiff.diffOneWinner(
          Tables.load(spark, sfDir, t.name), Tables.load(spark, sfDir, t.name), t.pk)
      }),
      // MERGE roundtrip: applying a table's one-winner diff back onto its
      // before snapshot reconstructs the after snapshot exactly — the
      // write-back operator, oracle-pinned against the independently
      // normalized after table.
      "diff_apply_roundtrip" -> ((spark, sfDir) => {
        val t = Tables.orders
        val before = Tables.load(spark, sfDir, t.name)
        val d = SnapshotDiff.diffOneWinner(before, after(spark, sfDir, t), t.pk)
        SnapshotDiff.applyDiff(before, d, t.pk)
      }),
      // SCD2 history build over the diff: validity intervals per key
      // (temporal-warehouse output; see SnapshotDiff.scd2).
      "diff_scd2_orders" -> ((spark, sfDir) => {
        val t = Tables.orders
        SnapshotDiff.scd2(Tables.load(spark, sfDir, t.name), after(spark, sfDir, t), t.pk)
      }),
      // Point-in-time lookup over the SCD2 history: rows whose validity
      // interval covers version 1 — the temporal-warehouse query the
      // history exists to answer (equivalently: the after snapshot,
      // reconstructed purely from intervals). A pushed-down interval
      // predicate over the history frame, no join.
      "diff_scd2_asof" -> ((spark, sfDir) => {
        val t = Tables.orders
        SnapshotDiff.scd2(Tables.load(spark, sfDir, t.name), after(spark, sfDir, t), t.pk)
          .filter(col("valid_from") <= 1 &&
            (col("valid_to").isNull || col("valid_to") > 1))
      }),
      // Per-column drift report over the diff — "which columns changed, how
      // often": explode the modified-columns list of UPDATED rows, count
      // per column, rate against the updated-row total. The scalar total
      // stays lazy via crossJoin(broadcast(agg)) — no driver-side action at
      // plan-construction time.
      "diff_column_drift" -> ((spark, sfDir) => {
        val t = Tables.orders
        val d = SnapshotDiff.diff(
          Tables.load(spark, sfDir, t.name), after(spark, sfDir, t), t.pk)
        val upd = d
          .filter(col("diff_status") === "UPDATED" && col("side") === "BEFORE")
          .select(col("modified_columns"))
        val tot = upd.agg(count(lit(1)).as("n_updated_rows"))
        upd.select(explode(split(col("modified_columns"), ",")).as("col_name"))
          .groupBy(col("col_name")).agg(count(lit(1)).as("n_changed"))
          .crossJoin(broadcast(tot))
          .withColumn("change_rate",
            col("n_changed").cast("double") / col("n_updated_rows"))
      }),
      // P1+P2+P3 normalization exposed directly.
      "snapshot_normalize_customer" -> ((spark, sfDir) =>
        Normalize.withKey(Tables.load(spark, sfDir, "customer"), Tables.customer.pk)),
      // S3/S4 catalog surface: static table+PK metadata.
      "catalog_tables" -> ((spark, _) => {
        import spark.implicits._
        Tables.all.map(t => (t.name, t.pk.mkString(","), t.cols.length))
          .toDF("table_name", "pk_columns", "n_columns")
      }),
      // A1/A2: global row counts per table (distributed count, no driver maps).
      "catalog_counts" -> ((spark, sfDir) => {
        Tables.all.map { t =>
          Tables.load(spark, sfDir, t.name)
            .agg(count(lit(1)).as("n_rows"))
            .select(lit(t.name).as("table_name"), col("n_rows"))
        }.reduce(_.unionByName(_))
      })
    )
  }

  val oracleSql: Map[String, String] = {
    val perTable = Tables.diffable.map { t =>
      s"diff_${t.name}" -> DiffOracle.diffSql(t, Mutations.afterSql(t.name), t.pk)
    }.toMap

    perTable ++ Map(
      "diff_region_keyless" ->
        DiffOracle.diffSql(Tables.region, Mutations.afterSql("region"), Tables.region.cols),
      "diff_identity_nation" -> DiffOracle.identitySql(Tables.nation),
      "diff_lineitem_onewinner" -> DiffOracle.diffSql(
        Tables.lineitem, Mutations.afterSql("lineitem"), Tables.lineitem.pk, oneWinner = true),
      "diff_identity_onewinner" -> DiffOracle.diffSql(
        Tables.lineitem, "SELECT * FROM lineitem", Tables.lineitem.pk, oneWinner = true),
      "diff_report" ->
        DiffOracle.reportSql(Tables.diffable.map(t => t -> Mutations.afterSql(t.name))),
      "snapshot_normalize_customer" ->
        DiffOracle.normalizedSelect("customer", Tables.customer, Tables.customer.pk),
      "diff_apply_roundtrip" -> DiffOracle.normalizedOneWinnerSql(
        Tables.orders, Mutations.afterSql("orders"), Tables.orders.pk),
      "diff_scd2_orders" -> DiffOracle.scd2Sql(
        Tables.orders, Mutations.afterSql("orders"), Tables.orders.pk),
      "diff_column_drift" -> DiffOracle.driftSql(
        Tables.orders, Mutations.afterSql("orders"), Tables.orders.pk),
      "diff_scd2_asof" -> {
        val hist = DiffOracle.scd2Sql(
          Tables.orders, Mutations.afterSql("orders"), Tables.orders.pk)
        s"""SELECT * FROM (
           |$hist
           |) h WHERE valid_from <= 1 AND (valid_to IS NULL OR valid_to > 1)""".stripMargin
      },
      "catalog_tables" -> {
        val rows = Tables.all
          .map(t => s"('${t.name}', '${t.pk.mkString(",")}', ${t.cols.length})")
          .mkString(", ")
        s"SELECT * FROM (VALUES $rows) AS t(table_name, pk_columns, n_columns)"
      },
      "catalog_counts" -> Tables.all
        .map(t => s"SELECT '${t.name}' AS table_name, COUNT(*) AS n_rows FROM ${t.name}")
        .mkString("\nUNION ALL\n")
    )
  }
}
