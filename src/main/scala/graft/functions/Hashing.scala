package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic cross-engine hashing.
  *
  * The LLM-pipeline operators (minhash, simhash, LSH) need a hash function
  * that produces identical values in the Spark engine and the DuckDB
  * oracle. Spark's `hash`/`xxhash64` and DuckDB's `hash` are different
  * algorithms, so we derive a 60-bit positive integer from the md5 hex
  * digest — md5 is identical everywhere and both engines evaluate it as a
  * codegen'd built-in. At 100 TB scale one would swap [[hash64]] for
  * `xxhash64` (cheaper, same distribution properties); the operator
  * structure is unchanged.
  */
object Hashing {
  /** 60-bit positive hash of a string column (15 hex chars of md5). */
  def hash64(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** DuckDB SQL equivalent of [[hash64]] for oracle generation. */
  def hash64Sql(e: String): String =
    s"CAST(concat('0x', substr(md5(CAST($e AS VARCHAR)),1,15)) AS BIGINT)"

  /** Fixed-length hex hash as a STRING — for min-hash style aggregates,
    * lexicographic MIN over same-length hex ≡ numeric MIN, and skipping the
    * base conversion keeps the hot loop cheap. */
  def hashHex(c: Column): Column = substring(md5(c.cast("string")), 1, 15)

  /** DuckDB SQL equivalent of [[hashHex]]. */
  def hashHexSql(e: String): String = s"substr(md5(CAST($e AS VARCHAR)),1,15)"

  /** Tokenization shared by the text/dedup operators: split on single
    * spaces, drop empties. */
  def tokens(c: Column): Column =
    filter(split(c, " "), t => t =!= "")

  /** DuckDB SQL equivalent of [[tokens]]. */
  def tokensSql(e: String): String =
    s"list_filter(string_split($e, ' '), t -> t <> '')"
}
