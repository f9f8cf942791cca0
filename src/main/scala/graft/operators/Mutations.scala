package graft.operators

/** Deterministic "after"-snapshot synthesis for the diff harness.
  *
  * The reference diffs two live snapshots of a mutable database
  * (`/root/reference/cmd/dbdiff/main.go:62-87`). The file-based harness has
  * no mutable store, so the *after* snapshot is derived from the *before*
  * parquet with deterministic key-mod mutations: deletes (`pk % m = 3`-ish),
  * in-place column updates, and inserts with keys shifted far above the
  * existing key range (so the separator-less key concat of
  * `extract_data.go:154` cannot collide between old and new rows).
  *
  * Each mutation is ONE SQL string, deliberately written in the common
  * subset of Spark SQL and DuckDB SQL: the engine executes it with
  * `spark.sql` over a temp view and the DuckDB oracle embeds it verbatim as
  * a CTE, so the two snapshots being diffed are identical by construction
  * and cannot drift.
  *
  * Precondition on that common subset: `concat` is only applied to string
  * columns that are never NULL in the fixtures (Spark's concat returns
  * NULL if any argument is NULL; DuckDB's skips NULLs). TESTDATA string
  * columns are non-null at every scale factor; if that ever changes, wrap
  * the arguments in COALESCE.
  *
  * Insert-band discipline: every SCALED table's insert offset is 1e10
  * (second generation 2e10) — above any key the [[graft.ScaleUp]] decades
  * can mint (sf10 tops out at ~1.5e8 order keys; round 5's 1e5–1e8 bands
  * collided with sf10 customer/part keys, silently turning intended
  * INSERTs into duplicate-key rows). Both offsets are ≡ 0 (mod 20), so
  * every `pk % m` mutation-class predicate reads the same residue on
  * shifted and unshifted keys. `region`/`nation` are pinned dimension
  * constants and keep their +1000 band.
  */
object Mutations {
  val afterSql: Map[String, String] = Map(
    "region" ->
      """SELECT r_regionkey,
        |       CASE WHEN r_regionkey % 5 = 1 THEN concat(r_name, '_v2') ELSE r_name END AS r_name
        |FROM region
        |WHERE r_regionkey % 5 <> 3
        |UNION ALL
        |SELECT r_regionkey + 1000 AS r_regionkey, concat('NEW_', r_name) AS r_name
        |FROM region
        |WHERE r_regionkey % 5 = 0""".stripMargin,
    "nation" ->
      """SELECT n_nationkey,
        |       CASE WHEN n_nationkey % 7 = 1 THEN concat(n_name, '_x') ELSE n_name END AS n_name,
        |       CASE WHEN n_nationkey % 7 = 1 THEN n_regionkey + 1 ELSE n_regionkey END AS n_regionkey
        |FROM nation
        |WHERE n_nationkey % 7 <> 3
        |UNION ALL
        |SELECT n_nationkey + 1000 AS n_nationkey, concat('NEW_', n_name) AS n_name, n_regionkey
        |FROM nation
        |WHERE n_nationkey % 7 = 0""".stripMargin,
    "customer" ->
      """SELECT c_custkey, c_name, c_nationkey,
        |       CASE WHEN c_custkey % 10 = 4 THEN c_acctbal + 100.5 ELSE c_acctbal END AS c_acctbal,
        |       CASE WHEN c_custkey % 10 = 4 THEN 'MODSEG' ELSE c_mktsegment END AS c_mktsegment
        |FROM customer
        |WHERE c_custkey % 10 <> 3
        |UNION ALL
        |SELECT c_custkey + 10000000000 AS c_custkey, concat('NEW_', c_name) AS c_name,
        |       c_nationkey, c_acctbal, c_mktsegment
        |FROM customer
        |WHERE c_custkey % 10 = 5""".stripMargin,
    "supplier" ->
      """SELECT s_suppkey, s_name, s_nationkey,
        |       CASE WHEN s_suppkey % 5 = 1 THEN s_acctbal + 0.25 ELSE s_acctbal END AS s_acctbal
        |FROM supplier
        |WHERE s_suppkey % 5 <> 3
        |UNION ALL
        |SELECT s_suppkey + 10000000000 AS s_suppkey, concat('NEW_', s_name) AS s_name, s_nationkey, s_acctbal
        |FROM supplier
        |WHERE s_suppkey % 5 = 0""".stripMargin,
    "part" ->
      """SELECT p_partkey, p_name, p_brand, p_type,
        |       CASE WHEN p_partkey % 10 = 4 THEN p_size + 1 ELSE p_size END AS p_size,
        |       CASE WHEN p_partkey % 10 = 4 THEN p_retailprice + 10.5 ELSE p_retailprice END AS p_retailprice
        |FROM part
        |WHERE p_partkey % 10 <> 3
        |UNION ALL
        |SELECT p_partkey + 10000000000 AS p_partkey, concat('NEW_', p_name) AS p_name,
        |       p_brand, p_type, p_size, p_retailprice
        |FROM part
        |WHERE p_partkey % 10 = 5""".stripMargin,
    "orders" ->
      """SELECT o_orderkey, o_custkey,
        |       CASE WHEN o_orderkey % 10 = 4 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
        |       CASE WHEN o_orderkey % 10 = 4 THEN o_totalprice + 0.25 ELSE o_totalprice END AS o_totalprice,
        |       o_orderdate, o_orderpriority
        |FROM orders
        |WHERE o_orderkey % 10 <> 3
        |UNION ALL
        |SELECT o_orderkey + 10000000000 AS o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |       o_orderdate, o_orderpriority
        |FROM orders
        |WHERE o_orderkey % 10 = 5""".stripMargin,
    "events" ->
      """SELECT event_id, ts, user_id,
        |       CASE WHEN event_id % 10 = 4 THEN 'mutated' ELSE event_type END AS event_type,
        |       CASE WHEN event_id % 10 = 4 THEN value + 1 ELSE value END AS value,
        |       props
        |FROM events
        |WHERE event_id % 10 <> 3
        |UNION ALL
        |SELECT event_id + 10000000000 AS event_id, ts, user_id, event_type, value, props
        |FROM events
        |WHERE event_id % 10 = 5""".stripMargin,
    "documents" ->
      """SELECT doc_id,
        |       CASE WHEN doc_id % 10 = 4 THEN concat(text, ' APPENDED') ELSE text END AS text,
        |       lang, source,
        |       CASE WHEN doc_id % 10 = 4 THEN n_chars + 9 ELSE n_chars END AS n_chars
        |FROM documents
        |WHERE doc_id % 10 <> 3
        |UNION ALL
        |SELECT doc_id + 10000000000 AS doc_id, text, lang, source, n_chars
        |FROM documents
        |WHERE doc_id % 10 = 5""".stripMargin,
    "lineitem" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
        |       CASE WHEN l_orderkey % 10 = 4 THEN l_quantity + 1 ELSE l_quantity END AS l_quantity,
        |       l_extendedprice, l_discount, l_tax,
        |       CASE WHEN l_orderkey % 10 = 4 THEN concat(l_returnflag, 'U') ELSE l_returnflag END AS l_returnflag,
        |       l_linestatus, l_shipdate
        |FROM lineitem
        |WHERE l_orderkey % 10 <> 3
        |UNION ALL
        |SELECT l_orderkey + 10000000000 AS l_orderkey, l_partkey, l_suppkey, l_linenumber,
        |       l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
        |FROM lineitem
        |WHERE l_orderkey % 10 = 5 AND l_linenumber = 1""".stripMargin
  )

  /** Schema-evolved `customer` snapshot: DROPS `c_mktsegment`, ADDS a
    * derived `c_tier`, and mutates data in the surviving columns (updates
    * on %10=4, deletes on %10=6, inserts from %10=2) — the realistic
    * "the table changed shape between snapshots" case the reference
    * handles only degenerately (column-count mismatch marks every column
    * modified, extract_data.go:162-171). */
  val schemaEvolvedCustomerSql: String =
    """SELECT c_custkey, c_name, c_nationkey,
      |       CASE WHEN c_custkey % 10 = 4 THEN c_acctbal + 50.25 ELSE c_acctbal END AS c_acctbal,
      |       CASE WHEN c_acctbal > 5000 THEN 'gold' ELSE 'std' END AS c_tier
      |FROM customer
      |WHERE c_custkey % 10 <> 6
      |UNION ALL
      |SELECT c_custkey + 20000000000 AS c_custkey, concat('NEW_', c_name) AS c_name,
      |       c_nationkey, c_acctbal, 'new' AS c_tier
      |FROM customer
      |WHERE c_custkey % 10 = 2""".stripMargin

  /** Second divergent branch of `orders` for the three-way merge: crafted so
    * every merge class is populated against `afterSql("orders")` as the left
    * branch — %20=4 updated identically (BOTH_SAME), %20=14 updated
    * differently (CONFLICT), %10=6 updated on the right only
    * (RIGHT_CHANGE); %20=3 deleted on both (BOTH_SAME), %10=7 deleted on
    * the right only, %20=13 deleted on the left only; %20=5 inserted
    * identically on both, %10=9 inserted on the right only, %20=15
    * inserted on the left only. Same common-SQL-subset discipline as
    * [[afterSql]]. */
  /** Third snapshot of the A→B→C orders chain for CDC-changefeed
    * compaction (diff composition): a SECOND round of mutations over the
    * gen-1 after snapshot (view `ordb`; the base `orders` view supplies
    * re-inserted rows), crafted so every composition class is populated:
    * %20=4 updated in both generations (U∘U), %20=14 updated then deleted
    * (U∘D), %10=6 updated only in gen 2, B-inserted keys split %20=5
    * deleted again (I∘D — must VANISH from the net diff) vs %20=15
    * updated (I∘U — net INSERT with final values), %30=3 reinserted after
    * the gen-1 delete with different values (D∘I — net UPDATE), %10=9
    * deleted only in gen 2, +2e10 keys inserted only in gen 2. */
  val gen2OrdersSql: String =
    """SELECT o_orderkey, o_custkey,
      |       CASE WHEN o_orderkey % 20 = 4 THEN 'Z'
      |            WHEN o_orderkey % 10 = 6 THEN 'W'
      |            ELSE o_orderstatus END AS o_orderstatus,
      |       CASE WHEN o_orderkey % 20 = 4 THEN o_totalprice + 1.0
      |            WHEN o_orderkey >= 10000000000 AND o_orderkey % 20 = 15
      |              THEN o_totalprice + 3.0
      |            ELSE o_totalprice END AS o_totalprice,
      |       o_orderdate, o_orderpriority
      |FROM ordb
      |WHERE o_orderkey % 20 <> 14
      |  AND NOT (o_orderkey >= 10000000000 AND o_orderkey % 20 = 5)
      |  AND o_orderkey % 10 <> 9
      |UNION ALL
      |SELECT o_orderkey, o_custkey, 'RI' AS o_orderstatus,
      |       o_totalprice + 7.5 AS o_totalprice, o_orderdate, o_orderpriority
      |FROM orders WHERE o_orderkey % 30 = 3
      |UNION ALL
      |SELECT o_orderkey + 20000000000 AS o_orderkey, o_custkey, o_orderstatus,
      |       o_totalprice, o_orderdate, o_orderpriority
      |FROM orders WHERE o_orderkey % 10 = 7""".stripMargin

  val threeWayRightSql: String =
    """SELECT o_orderkey, o_custkey,
      |       CASE WHEN o_orderkey % 20 = 4 THEN 'X'
      |            WHEN o_orderkey % 20 = 14 THEN 'Y'
      |            WHEN o_orderkey % 10 = 6 THEN 'R'
      |            ELSE o_orderstatus END AS o_orderstatus,
      |       CASE WHEN o_orderkey % 20 = 4 THEN o_totalprice + 0.25
      |            WHEN o_orderkey % 20 = 14 THEN o_totalprice + 0.5
      |            WHEN o_orderkey % 10 = 6 THEN o_totalprice + 1.0
      |            ELSE o_totalprice END AS o_totalprice,
      |       o_orderdate, o_orderpriority
      |FROM orders
      |WHERE o_orderkey % 20 <> 3 AND o_orderkey % 10 <> 7
      |UNION ALL
      |SELECT o_orderkey + 10000000000 AS o_orderkey, o_custkey, o_orderstatus,
      |       o_totalprice, o_orderdate, o_orderpriority
      |FROM orders
      |WHERE o_orderkey % 20 = 5 OR o_orderkey % 10 = 9""".stripMargin
}
