package graft

import graft.operators.LinkageQueries

/** Pins the ER pipeline's semantics on constructed customers (the
  * fixture-scale outcome is pinned by the DuckDB oracle gate): single- and
  * double-deletion records resolve to their true identity even with a
  * near-twin in the same block, and a nation-shifted record is a blocking
  * miss, not a false match. */
class LinkageSpec extends SparkTestBase {
  import spark.implicits._

  private def customers = Seq(
    // near-twins in ONE block (nation 1, segment A, band 0): best-match
    // must pick the lev-1 true identity over the lev-2 twin
    (5L, "Customer#000000005", 1, 100.0, "AUTOMOBILE"),
    (45L, "Customer#000000045", 1, 120.0, "AUTOMOBILE"),
    // 11 % 11 == 0: double deletion, still recoverable at lev 2
    (11L, "Customer#000000011", 3, 900.0, "MACHINERY"),
    // 13 % 13 == 0: nation shifted to 4, where no customer lives → miss
    (13L, "Customer#000000013", 3, 900.0, "MACHINERY"))
    .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")

  test("best-match resolves true identity; planted nation shift is a miss") {
    val out = LinkageQueries.matches(customers).collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(out.size == 4)
    assert(out(5L) == (Some(5L), Some(1L)), out.toString)   // beats twin 45
    assert(out(45L) == (Some(45L), Some(1L)), out.toString)
    assert(out(11L) == (Some(11L), Some(2L)), out.toString) // double deletion
    assert(out(13L) == (None, None), out.toString)          // blocking miss
  }

  test("golden records: matched rows take clean fields, misses stay provisional") {
    import graft.operators.LinkageQueries.{dirtySide, matches}
    import org.apache.spark.sql.functions._
    val golden = matches(customers)
      .join(dirtySide(customers), Seq("dirty_id"))
      .join(customers.select(col("c_custkey").as("matched_key"), col("c_name"),
        col("c_nationkey"), col("c_acctbal")), Seq("matched_key"), "left_outer")
      .select(col("dirty_id"),
        coalesce(col("c_name"), col("name_d")).as("name"),
        when(col("matched_key").isNull, "provisional").otherwise("linked").as("prov"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    // matched rows are REPAIRED to the authoritative clean name
    assert(golden(5L) == ("Customer#000000005", "linked"), golden.toString)
    assert(golden(11L) == ("Customer#000000011", "linked"), golden.toString)
    // the blocking miss keeps its corrupted name, flagged provisional
    assert(golden(13L) == ("Cusomer#000000013", "provisional"), golden.toString)
  }

  test("band-boundary jitter cannot lose a true pair") {
    // bal 498 + jitter (custkey 6 % 7 = 6) crosses a band boundary
    // (498 → band 71, 504 → band 72 at BandWidth 7): the ±1 band
    // explosion must still block the true pair together
    val edge = Seq((6L, "Customer#000000006", 1, 498.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val out = LinkageQueries.matches(edge).collect()
    assert(out.length == 1 && out.head.getLong(1) == 6L, out.mkString(","))
  }
}
