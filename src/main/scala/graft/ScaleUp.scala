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
  *  - Document text is alphabet-ROTATED per replica (`translate`, length-
  *    preserving): each replica keeps the exact internal dup/near-dup
  *    structure of the original corpus while sharing zero shingles across
  *    replicas — so LSH candidate volume grows linearly with data, instead
  *    of quadratically as naive text copies would (every doc suddenly
  *    having `factor` exact twins is not what 10× more data means).
  *    `doc_id` stride stays below the 100000/200000 synthetic-duplicate
  *    offsets baked into [[operators.DedupQueries.deltaSql]].
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
    val spark = GraftSession.create(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-scaleup")
    try run(spark, src, dst, factor) finally spark.stop()
  }

  def run(spark: SparkSession, src: String, dst: String, factor: Int): Unit = {
    def tbl(name: String): DataFrame = Tables.load(spark, src, name)
    // key stride = max+1, so replica keyspaces tile without gaps that would
    // skew modulo-based selections (deltaSql's doc_id % 50, mutation picks)
    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head.getLong(0) + 1L

    val custS  = stride(tbl("customer"), "c_custkey")
    val suppS  = stride(tbl("supplier"), "s_suppkey")
    val partS  = stride(tbl("part"), "p_partkey")
    val orderS = stride(tbl("orders"), "o_orderkey")
    val eventS = stride(tbl("events"), "event_id")
    val userS  = stride(tbl("events"), "user_id")
    val docS   = stride(tbl("documents"), "doc_id")
    val vecS   = stride(tbl("embeddings"), "vec_id")
    require(docS * factor <= 100000L,
      s"doc_id stride $docS x $factor collides with deltaSql's +100000 synthetic band")

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

    write(tbl("region"), "region", 1)
    write(tbl("nation"), "nation", 1)
    write(inflate(tbl("customer"), Map("c_custkey" -> custS)), "customer", 4)
    write(inflate(tbl("supplier"), Map("s_suppkey" -> suppS)), "supplier", 1)
    write(inflate(tbl("part"), Map("p_partkey" -> partS)), "part", 4)
    write(inflate(tbl("orders"),
      Map("o_orderkey" -> orderS, "o_custkey" -> custS)), "orders", 16)
    write(inflate(tbl("lineitem"),
      Map("l_orderkey" -> orderS, "l_partkey" -> partS, "l_suppkey" -> suppS)),
      "lineitem", 32)
    write(inflate(tbl("events"),
      Map("event_id" -> eventS, "user_id" -> userS)), "events", 16)

    // per-replica Caesar rotation of [a-z]: length-preserving, so n_chars
    // stays truthful and every token/shingle statistic is replica-invariant
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    val rotations = (0 until factor).map(r => alpha.drop(r % 26) + alpha.take(r % 26))
    write(inflate(tbl("documents"), Map("doc_id" -> docS), (d, r) => {
      val rot = (1 until factor).foldLeft(when(r === 0, col("text"))) {
        (acc, i) => acc.when(r === i, translate(col("text"), alpha, rotations(i)))
      }
      d.withColumn("text", rot.otherwise(col("text")))
    }), "documents", 8)

    // deterministic sub-1% perturbation, replica 0 exact; keeps vectors
    // near their original cluster (IVF routing stays meaningful) without
    // factor-way cosine ties at the top of any result list
    write(inflate(tbl("embeddings"), Map("vec_id" -> vecS), (d, r) =>
      d.withColumn("embedding", when(r === 0, col("embedding")).otherwise(
        expr("transform(embedding, (x, i) -> cast(x + " +
          "((vec_id * 31 + i * 7 + __r * 13) % 201 - 100) * 0.002 AS float))")))),
      "embeddings", 4)

    val counts = Tables.all.map(t =>
      t.name -> spark.read.parquet(s"$dst/${t.name}.parquet").count())
    println(counts.map { case (n, c) => s"$n=$c" }.mkString("scaleup done: ", ", ", ""))
  }
}
