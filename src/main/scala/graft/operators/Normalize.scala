package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot normalization — the reference's scan-time type erasure.
  *
  * The reference scans every cell of every table into a nullable string
  * (`/root/reference/extract_data.go:61-78`), renders SQL NULL as the
  * sentinel `"<NULL>"` (`extract_data.go:111-116`), and keys each row by the
  * separator-less concatenation of its primary-key columns' string values in
  * PK order (`extract_data.go:149-160`). All downstream comparison semantics
  * (string equality, NULL==NULL, key collisions) follow from this step.
  *
  * Spark-first restatement: a single `select` of codegen'd expressions —
  * `coalesce(cast(c as string), '<NULL>')` per column plus one `concat` for
  * the key. Stays entirely inside whole-stage codegen; column pruning and
  * filter pushdown still reach the parquet scan because this is a plain
  * projection.
  */
object Normalize {
  /** `extract_data.go:112-115` — NULL renders as this sentinel. Faithfully
    * kept, including the collision with a literal "<NULL>" string (SURVEY
    * §7.4.2). */
  val NullSentinel = "<NULL>"

  /** Key column name added by [[withKey]]. */
  val KeyCol = "__key"

  def stringifyCol(c: String): Column =
    coalesce(col(c).cast("string"), lit(NullSentinel)).as(c)

  /** P1+P2: every column → non-null string with NULL sentinel. Preserves
    * column order (the reference compares positionally,
    * `extract_data.go:174-183`). */
  def stringify(df: DataFrame): DataFrame =
    df.select(df.columns.toIndexedSeq.map(stringifyCol): _*)

  /** P3: adds `__key` = separator-less concat of the PK columns' normalized
    * string values, in PK order (`extract_data.go:149-160`). Deliberately
    * `concat`, not `concat_ws` — reference fidelity (SURVEY §7.4.1).
    * Empty `pk` is not allowed: the reference's PK-less fallback passes all
    * columns as the key (`dbutil.go:136-141`), i.e. `pk = df.columns`.
    */
  def withKey(df: DataFrame, pk: Seq[String]): DataFrame = {
    require(pk.nonEmpty, "pk must be non-empty (PK-less tables key on all columns)")
    val s = stringify(df)
    s.withColumn(KeyCol, concat(pk.map(col): _*))
  }
}
