package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Inflates the sf0.1 fixtures by an integer factor (default 10 → "sf1")
  * for the scaling benchmark — one decade beyond the driver-generated data.
  *
  * The inflation must preserve the WORKLOAD SHAPE, not just the row count,
  * or the sf1 point measures a different problem:
  *
  *  - Every key column shifts by `replica * (max(key)+1)` so join fan-outs
  *    and per-key group sizes stay what they are at sf0.1 (10× groups, not
  *    10×-bigger groups). `events.user_id` shifts too: window/session state
  *    per user is constant, user count grows — how a real corpus grows.
  *  - Document text goes through a per-replica AFFINE SUBSTITUTION cipher
  *    (x → a·x + b mod 26 over [a-z], applied via `translate` — length-
  *    preserving): each replica keeps the exact internal dup/near-dup
  *    structure of the original corpus while sharing no shingles across
  *    replicas — so LSH candidate volume grows linearly with data, instead
  *    of quadratically as naive text copies would (every doc suddenly
  *    having `factor` exact twins is not what 10× more data means).
  *    Affine rather than pure rotation because rotation offers only 26
  *    distinct maps: at factor 100 replicas 0/26/52/78 would share a map
  *    and recreate the 4-way exact-twin cliques the transform exists to
  *    prevent. The 12 units of Z26 × 26 shifts give 312 distinct maps
  *    (replica 0 stays the identity), and any two maps agree on at most 2
  *    letters, so no 3-word shingle survives across replicas.
  *    `doc_id` stride stays below the synthetic-duplicate band base
  *    [[operators.DedupQueries.DeltaBase]] (1e8 — room for sf1000 docs).
  *  - Embeddings get a small deterministic per-replica, per-dimension
  *    perturbation so ANN top-k at sf1 ranks 10× more real candidates
  *    instead of collapsing into factor-way exact-tie clusters.
  *  - `region`/`nation` are dimension constants in TPC-H and stay as-is.
  *
  * Output goes under the repo (gitignored), never to /root/testdata.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SRC_DIR", "/root/testdata/sf0.1")
    val dst = sys.env.getOrElse("SPARK_GRAFT_DST_DIR", "/root/repo/testdata/sf1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_FACTOR", "10").toInt
    val only = sys.env.get("SPARK_GRAFT_TABLES").map(_.split(",").map(_.trim).toSet)
    val copyRest = sys.env.getOrElse("SPARK_GRAFT_COPY_REST", "1") != "0"
    val spark = GraftSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-scaleup")
    try run(spark, src, dst, factor, only, copyRest) finally spark.stop()
  }

  /** `only`: restrict inflation to the named tables; the rest COPY from
    * `src` unscaled so the destination stays a complete fixture directory —
    * or, with `copyRest=false`, are left entirely untouched (for topping up
    * individual tables of an existing fixture dir in place). */
  def run(spark: SparkSession, src: String, dst: String, factor: Int,
      only: Option[Set[String]] = None, copyRest: Boolean = true): Unit = {
    def tbl(name: String): DataFrame = Tables.load(spark, src, name)
    // key stride = max+1, so replica keyspaces tile without gaps that would
    // skew modulo-based selections (deltaSql's doc_id % 50, mutation picks)
    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head.getLong(0) + 1L

    def scaled(name: String): Boolean = only.forall(_.contains(name))
    val custS  = stride(tbl("customer"), "c_custkey")
    val suppS  = stride(tbl("supplier"), "s_suppkey")
    val partS  = stride(tbl("part"), "p_partkey")
    val orderS = stride(tbl("orders"), "o_orderkey")
    val eventS = stride(tbl("events"), "event_id")
    val userS  = stride(tbl("events"), "user_id")
    val docS   = if (scaled("documents")) stride(tbl("documents"), "doc_id") else 0L
    val vecS   = if (scaled("embeddings")) stride(tbl("embeddings"), "vec_id") else 0L
    require(!scaled("documents") || docS * factor <= operators.DedupQueries.DeltaBase,
      s"doc_id stride $docS x $factor collides with the +${operators.DedupQueries.DeltaBase} synthetic band")

    // one scan per table: explode a replica index, shift keys per replica
    def inflate(df: DataFrame, shifts: Map[String, Long],
        extra: (DataFrame, org.apache.spark.sql.Column) => DataFrame = (d, _) => d): DataFrame = {
      val withR = df.withColumn("__r",
        explode(sequence(lit(0L), lit(factor - 1L))))
      val shifted = shifts.foldLeft(withR) { case (d, (k, s)) =>
        d.withColumn(k, col(k) + col("__r") * lit(s))
      }
      extra(shifted, col("__r")).drop("__r")
    }

    def write(df: DataFrame, name: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite").parquet(s"$dst/$name.parquet")
    // unscaled tables copy through so the destination is a complete
    // fixture, unless copyRest=false (in-place top-up of one table)
    def writeScaled(name: String, parts: Int)(mk: => DataFrame): Unit =
      if (scaled(name)) write(mk, name, parts)
      else if (copyRest) write(tbl(name), name, parts)

    if (copyRest) {
      write(tbl("region"), "region", 1)
      write(tbl("nation"), "nation", 1)
    }
    // key-derived name columns regenerate from the SHIFTED key: replicas
    // otherwise share names verbatim, and any name-keyed operator (ER
    // blocking, fuzzy matching) sees factor-way duplicate-name cliques
    // that no organically-grown table has — the same artifact the
    // documents' Caesar rotation prevents for text
    writeScaled("customer", 4)(inflate(tbl("customer"), Map("c_custkey" -> custS),
      (d, _) => d.withColumn("c_name",
        concat(lit("Customer#"), lpad(col("c_custkey").cast("string"), 9, "0")))))
    writeScaled("supplier", 1)(inflate(tbl("supplier"), Map("s_suppkey" -> suppS),
      (d, _) => d.withColumn("s_name",
        concat(lit("Supplier#"), lpad(col("s_suppkey").cast("string"), 9, "0")))))
    writeScaled("part", 4)(inflate(tbl("part"), Map("p_partkey" -> partS)))
    writeScaled("orders", 16)(inflate(tbl("orders"),
      Map("o_orderkey" -> orderS, "o_custkey" -> custS)))
    writeScaled("lineitem", 32)(inflate(tbl("lineitem"),
      Map("l_orderkey" -> orderS, "l_partkey" -> partS, "l_suppkey" -> suppS)))
    writeScaled("events", 16)(inflate(tbl("events"),
      Map("event_id" -> eventS, "user_id" -> userS)))

    // per-replica affine substitution of [a-z]: length-preserving, so
    // n_chars stays truthful and every token/shingle statistic is
    // replica-invariant; (a, b) pairs are distinct for r < 156, covering
    // the factor-100 sf0.1 → sf10 document jump in one shot
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    val units = Seq(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25) // Z26 units; units(0)=1
    require(factor <= 156, s"affine map space exhausted at factor $factor (max 156)")
    val subst = (0 until factor).map { r =>
      val (a, b) = (units(r % 12), r % 26)
      alpha.map(ch => alpha((a * (ch - 'a') + b) % 26)).mkString
    }
    writeScaled("documents", 8)(inflate(tbl("documents"), Map("doc_id" -> docS), (d, r) => {
      val sub = (1 until factor).foldLeft(when(r === 0, col("text"))) {
        (acc, i) => acc.when(r === i, translate(col("text"), alpha, subst(i)))
      }
      d.withColumn("text", sub.otherwise(col("text")))
    }))

    // deterministic sub-1% perturbation, replica 0 exact; keeps vectors
    // near their original cluster (IVF routing stays meaningful) without
    // factor-way cosine ties at the top of any result list
    writeScaled("embeddings", 4)(inflate(tbl("embeddings"), Map("vec_id" -> vecS), (d, r) =>
      d.withColumn("embedding", when(r === 0, col("embedding")).otherwise(
        expr("transform(embedding, (x, i) -> cast(x + " +
          "((vec_id * 31 + i * 7 + __r * 13) % 201 - 100) * 0.002 AS float))")))))

    val counts = Tables.all.map(t =>
      t.name -> spark.read.parquet(s"$dst/${t.name}.parquet").count())
    println(counts.map { case (n, c) => s"$n=$c" }.mkString("scaleup done: ", ", ", ""))
  }
}
