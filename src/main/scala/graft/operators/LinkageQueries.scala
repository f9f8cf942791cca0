package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity resolution / record linkage — fuzzy matching of records that
  * share no key, the data-integration sibling of the exact-key snapshot
  * diff (`SnapshotDiff` handles "same key, changed row"; this handles
  * "same entity, corrupted identity").
  *
  * The classic scale shape, end to end:
  *   1. a deterministic "dirty" side derived from `customer` with
  *      engine-identical SQL (character deletions, balance jitter, and for
  *      every 13th record a WRONG nation — a planted blocking miss);
  *   2. BLOCKING: candidates come only from an equi-join on
  *      (nation, segment, balance-band, corruption-invariant name tail) —
  *      the dirty side explodes into its band ±1 neighborhood (bounded
  *      3×), so band-boundary jitter cannot lose a true pair and NO
  *      all-pairs comparison exists at any size; the tail key's
  *      cardinality grows with the data, keeping per-block size flat
  *      after the jitter-bounded balance axis saturates;
  *   3. SCORING: `levenshtein` over the blocked candidates only, kept at
  *      distance ≤ 2;
  *   4. RESOLUTION: best match per dirty record by (distance, key) —
  *      deterministic winner, unmatched records kept via a left join;
  *   5. EVALUATION: because the corruption is synthetic the true identity
  *      is known, so precision/recall are exact integer outputs, not
  *      estimates.
  *
  * At 100 TB: every join is an equi-join on a low-cardinality composite
  * block key; per-block fan-out is bounded by block size (nation × segment
  * × [[BandWidth]]-wide balance band), the standard ER blocking trade —
  * and the band width is the knob that scales block COUNT with data
  * (see [[BandWidth]]). Edit-distance
  * runs on candidate pairs only. Skewed blocks would salt like any keyed
  * join ([[SkewJoin]]).
  */
object LinkageQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Balance-band blocking width. The dirty side's balance jitter is
    * bounded (+0..6), so ANY width ≥ 7 keeps the ±1-band explosion
    * lossless for true pairs; the width then ONLY controls block
    * granularity — and block count is what must scale with data (the sf1
    * run showed the original 500-wide bands going quadratic: fixed block
    * count × 10× rows per block = 100× candidate pairs; the sf10 run then
    * re-saturated a 50-wide band). 7 is the jitter-bound floor — the
    * finest lossless granularity this axis offers (~1 570 bands) — and
    * also maximizes precision (fewest coincidental same-block lev≤2
    * neighbors), all oracle-checked. Beyond that floor the scaling knob
    * moves to the name-tail axis: see [[tailLen]]. */
  val BandWidth = 7

  /** Corruption-invariant name-tail blocking length — the third axis's
    * CARDINALITY KNOB, and the one that keeps scaling after the balance
    * axis hits its jitter floor: cardinality 10^len must track the corpus
    * so per-block size stays O(1). len = ceil(log10 n) − 1 (floored at the
    * round-5 value 5, so every oracle scale and the recorded sf1 decade
    * block identically) keeps expected same-tail rows at ~10 per
    * (nation, segment) stratum at any size. The tail is pure digits —
    * the planted deletions hit name positions 4/7, inside the constant
    * "Customer" prefix, so ANY right-substring survives both corruptions;
    * recall is invariant to len by construction (true pairs always share
    * the full digit string). Next rung, at ~10⁹ rows where the 9-digit
    * tail itself exhausts: deletion-neighborhood keys over the name body
    * (block on each ≤2-deletion variant of a fixed prefix), which drops
    * the digits-survive assumption entirely. */
  def tailLen(n: Long): Int =
    math.max(5, math.ceil(math.log10(math.max(10L, n).toDouble)).toInt - 1)

  /** One deletion for everyone (4th char); a second deletion (7th char)
    * for every 11th record; nation shifted for every 13th (blocked away —
    * irrecoverable by design); balance jittered by +0..6. */
  private val nameD =
    """CASE WHEN c_custkey % 11 = 0
      |     THEN concat(substr(concat(substr(c_name,1,3), substr(c_name,5)),1,6),
      |                 substr(concat(substr(c_name,1,3), substr(c_name,5)),8))
      |     ELSE concat(substr(c_name,1,3), substr(c_name,5)) END""".stripMargin

  /** The corrupted side, derived with the SAME SQL text in both engines. */
  def dirtySide(customers: DataFrame): DataFrame =
    customers.select(
      col("c_custkey").as("dirty_id"),
      expr(nameD).as("name_d"),
      expr("CASE WHEN c_custkey % 13 = 0 THEN (c_nationkey + 1) % 25 ELSE c_nationkey END")
        .as("nation_d"),
      col("c_mktsegment").as("seg_d"),
      expr("c_acctbal + (c_custkey % 7)").as("bal_d"))

  /** Blocked fuzzy best-match: one row per dirty record —
    * (dirty_id, matched_key, lev, is_correct), matched_key NULL when no
    * candidate survives the block + distance gate. */
  def matches(customers: DataFrame): DataFrame = matches(customers, -1L)

  def matches(customers: DataFrame, nKnown: Long): DataFrame = {
    // cheap count probe (one columnar scan, one row to the driver — the
    // same stats-read class as the changepoint crossover) sizes the
    // name-tail blocking key to the corpus; registry entries share the
    // session-memoized fixture count (Tables.countOf)
    val tl = tailLen(if (nKnown >= 0) nKnown else customers.count())
    val dirty = dirtySide(customers).withColumn("band",
      explode(expr(
        s"""array(CAST(floor(bal_d/$BandWidth) AS BIGINT) - 1,
           |      CAST(floor(bal_d/$BandWidth) AS BIGINT),
           |      CAST(floor(bal_d/$BandWidth) AS BIGINT) + 1)""".stripMargin)))
      .withColumn("tail5", expr(s"right(name_d, $tl)"))
    val clean = customers.select(
      col("c_custkey").as("cand_key"), col("c_name"),
      col("c_nationkey").as("nation_d"), col("c_mktsegment").as("seg_d"),
      expr(s"CAST(floor(c_acctbal/$BandWidth) AS BIGINT)").as("band"),
      expr(s"right(c_name, $tl)").as("tail5"))
    // blocking equi-join; a candidate's single band hits exactly one of the
    // dirty row's 3 exploded bands, so no dedup is needed. The second
    // blocking dimension is the CORRUPTION-INVARIANT name tail: the
    // planted deletions hit positions 4 and 7, so the last-5 substring
    // survives both — a key whose cardinality GROWS with the data, which
    // is what keeps per-block size flat after the jitter-bounded balance
    // axis saturates (sf10: 1.5M customers / ~1.6k bands went quadratic
    // again; with the tail key candidates stay ~O(1) per dirty row)
    val cands = dirty.join(clean, Seq("nation_d", "seg_d", "band", "tail5"))
      .select(col("dirty_id"), col("cand_key"),
        expr("CAST(levenshtein(c_name, name_d) AS BIGINT)").as("lev"))
      .filter(col("lev") <= 2)
    val w = Window.partitionBy(col("dirty_id")).orderBy(col("lev"), col("cand_key"))
    val best = cands.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    dirtySide(customers).select(col("dirty_id"))
      .join(best, Seq("dirty_id"), "left_outer")
      .select(col("dirty_id"), col("cand_key").as("matched_key"), col("lev"),
        when(col("cand_key") === col("dirty_id"), 1L).otherwise(0L).as("is_correct"))
  }

  val queries: Map[String, Q] = Map(
    // Per-record linkage outcome over the customer table vs its planted
    // corruption — the audit table an ER pipeline hands downstream.
    "er_blocked_matches" -> ((spark, sfDir) =>
      matches(Tables.load(spark, sfDir, "customer"),
        Tables.countOf(spark, sfDir, "customer"))),
    // SURVIVORSHIP (golden-record construction) — the second half of MDM:
    // matched records take every field from the authoritative clean side;
    // unmatched records keep their corrupted fields, flagged provisional
    // so downstream consumers see data lineage, not silent guesses. One
    // key equi-join onto the match table; at scale this is the
    // delta-sized repair pass that runs after each linkage batch.
    "er_golden_records" -> ((spark, sfDir) => {
      val customers = Tables.load(spark, sfDir, "customer")
      matches(customers, Tables.countOf(spark, sfDir, "customer"))
        .join(dirtySide(customers), Seq("dirty_id"))
        .join(customers.select(col("c_custkey").as("matched_key"), col("c_name"),
          col("c_nationkey"), col("c_acctbal")), Seq("matched_key"), "left_outer")
        .select(col("dirty_id"),
          coalesce(col("c_name"), col("name_d")).as("name"),
          coalesce(col("c_nationkey"), col("nation_d")).as("nationkey"),
          coalesce(col("c_acctbal"), col("bal_d")).as("acctbal"),
          when(col("matched_key").isNull, "provisional").otherwise("linked")
            .as("provenance"))
    }),
    // Exact-integer precision/recall readout: the planted ground truth
    // makes match quality a VERIFIABLE output (is_correct is known), so
    // the oracle hash-checks the evaluation itself.
    "er_match_quality" -> ((spark, sfDir) =>
      matches(Tables.load(spark, sfDir, "customer"),
        Tables.countOf(spark, sfDir, "customer")).agg(
        count(lit(1)).as("n_records"),
        count(col("matched_key")).as("n_matched"),
        sum(col("is_correct")).as("n_correct"),
        (count(lit(1)) - count(col("matched_key"))).as("n_missed"),
        expr("(SUM(is_correct) * 1000) DIV COUNT(matched_key)").as("precision_permille"))))

  private val matchesSql =
    s"""WITH dirty AS (
       |  SELECT c_custkey AS dirty_id,
       |         $nameD AS name_d,
       |         CASE WHEN c_custkey % 13 = 0 THEN (c_nationkey + 1) % 25
       |              ELSE c_nationkey END AS nation_d,
       |         c_mktsegment AS seg_d,
       |         c_acctbal + (c_custkey % 7) AS bal_d
       |  FROM customer),
       |tl AS (
       |  SELECT GREATEST(5, CAST(ceil(log10(GREATEST(10, n))) AS INT) - 1) AS t
       |  FROM (SELECT COUNT(*) AS n FROM customer) x),
       |cands AS (
       |  SELECT d.dirty_id, c.c_custkey AS cand_key,
       |         CAST(levenshtein(c.c_name, d.name_d) AS BIGINT) AS lev
       |  FROM dirty d CROSS JOIN tl
       |  JOIN customer c
       |    ON c.c_nationkey = d.nation_d AND c.c_mktsegment = d.seg_d
       |   AND right(c.c_name, tl.t) = right(d.name_d, tl.t)
       |   AND CAST(floor(c.c_acctbal/$BandWidth) AS BIGINT)
       |         BETWEEN CAST(floor(d.bal_d/$BandWidth) AS BIGINT) - 1
       |             AND CAST(floor(d.bal_d/$BandWidth) AS BIGINT) + 1
       |  WHERE levenshtein(c.c_name, d.name_d) <= 2),
       |best AS (
       |  SELECT dirty_id, cand_key, lev FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY dirty_id
       |                                 ORDER BY lev, cand_key) AS rn
       |    FROM cands) t WHERE rn = 1),
       |outcome AS (
       |  SELECT d.dirty_id, b.cand_key AS matched_key, b.lev,
       |         CAST(CASE WHEN b.cand_key = d.dirty_id THEN 1 ELSE 0 END AS BIGINT) AS is_correct
       |  FROM dirty d LEFT JOIN best b ON b.dirty_id = d.dirty_id)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "er_blocked_matches" ->
      s"""$matchesSql
         |SELECT dirty_id, matched_key, lev, is_correct FROM outcome""".stripMargin,
    "er_golden_records" ->
      s"""$matchesSql
         |SELECT m.dirty_id,
         |       COALESCE(c.c_name, d.name_d) AS name,
         |       COALESCE(c.c_nationkey, d.nation_d) AS nationkey,
         |       COALESCE(c.c_acctbal, d.bal_d) AS acctbal,
         |       CASE WHEN m.matched_key IS NULL THEN 'provisional' ELSE 'linked' END
         |         AS provenance
         |FROM outcome m
         |JOIN dirty d ON d.dirty_id = m.dirty_id
         |LEFT JOIN customer c ON c.c_custkey = m.matched_key""".stripMargin,
    "er_match_quality" ->
      s"""$matchesSql
         |SELECT COUNT(*) AS n_records,
         |       COUNT(matched_key) AS n_matched,
         |       CAST(SUM(is_correct) AS BIGINT) AS n_correct,
         |       COUNT(*) - COUNT(matched_key) AS n_missed,
         |       (CAST(SUM(is_correct) AS BIGINT) * 1000) // COUNT(matched_key) AS precision_permille
         |FROM outcome""".stripMargin)
}
