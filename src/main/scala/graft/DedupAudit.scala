package graft

import graft.functions.Hashing
import graft.operators.DedupQueries
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Developer tool: stage-row audit of the two shingle-set dedup verifiers
  * (`dedup_containment`, `dedup_prefix_jaccard`) — the r7
  * `text_inverted_index` diagnosis pattern. Prints one JSON line with the
  * row count of every pipeline stage so a growing per-decade time ratio
  * can be attributed to a specific stage (candidate generation vs the
  * packed-set verify join vs data-honest growth in planted-dup density).
  * `runMain graft.DedupAudit <sfDir>`.
  */
object DedupAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.create(cpus, "graft-dedupaudit")
    val out = scala.collection.mutable.LinkedHashMap[String, Long]()

    // ---- dedup_containment stages (mirrors the registry query) ----
    locally {
      val sh = DedupQueries.shingleHashes(DedupQueries.corpus(spark, sfDir))
        .transform(CacheScope.pinned)
      out("cont_sh_rows") = sh.count()
      val dfAll = sh.groupBy(col("sh64")).agg(count(lit(1)).as("df"))
        .transform(CacheScope.pinned)
      out("cont_distinct_shingles") = dfAll.count()
      val capped = dfAll.filter(col("df").between(2, 20)).select(col("sh64"))
      out("cont_capped_shingles") = capped.count()
      val idx = sh.join(capped, "sh64").transform(CacheScope.pinned)
      out("cont_idx_rows") = idx.count()
      val pairsRaw = idx.select(col("doc_id").as("doc_a"), col("sh64"))
        .join(idx.select(col("doc_id").as("doc_b"), col("sh64")), "sh64")
        .filter(col("doc_a") < col("doc_b"))
      out("cont_pair_join_rows") = pairsRaw.count()
      val cand = pairsRaw.groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("__n_shared"))
        .filter(col("__n_shared") >= 3)
        .select(col("doc_a"), col("doc_b"))
        .transform(CacheScope.pinned)
      out("cont_cand_pairs") = cand.count()
      val candDocs = cand.select(col("doc_a").as("doc_id"))
        .union(cand.select(col("doc_b").as("doc_id"))).distinct()
      out("cont_cand_docs") = candDocs.count()
      val setRows = sh.join(candDocs, Seq("doc_id"), "left_semi")
      out("cont_verify_set_input_rows") = setRows.count()
      CacheScope.releaseAll()
    }

    // ---- dedup_prefix_jaccard stages ----
    locally {
      val sh = DedupQueries.shingles(DedupQueries.corpus(spark, sfDir))
        .transform(CacheScope.pinned)
      out("pj_sh_rows") = sh.count()
      val gf = sh.groupBy(col("shingle")).agg(count(lit(1)).as("gf"))
      val wOrd = Window.partitionBy(col("doc_id")).orderBy(col("gf"), col("shingle"))
      val wN = Window.partitionBy(col("doc_id"))
      val prefix = sh.join(gf, "shingle")
        .withColumn("__rn", row_number().over(wOrd).cast("long"))
        .withColumn("__n", count(lit(1)).over(wN))
        .filter(expr("__rn <= __n div 2 + 1"))
        .select(col("doc_id"), col("shingle"), col("__rn"), col("__n"))
        .transform(CacheScope.pinned)
      out("pj_prefix_rows") = prefix.count()
      val ja = prefix.select(col("doc_id").as("doc_a"),
        Hashing.hash64(col("shingle")).as("__sh"),
        col("__rn").as("__rn_a"), col("__n").as("__n_a"))
      val jb = prefix.select(col("doc_id").as("doc_b"),
        Hashing.hash64(col("shingle")).as("__sh"),
        col("__rn").as("__rn_b"), col("__n").as("__n_b"))
      val pairJoin = ja.join(jb, "__sh").filter(col("doc_a") < col("doc_b"))
      out("pj_pair_join_rows") = pairJoin.count()
      val agg = pairJoin.groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("__s"),
          max(col("__rn_a")).as("__ia"), max(col("__rn_b")).as("__jb"),
          max(col("__n_a")).as("__na"), max(col("__n_b")).as("__nb"))
        .transform(CacheScope.pinned)
      out("pj_cand_pairs_raw") = agg.count()
      val lenOk = agg.filter(greatest(col("__na"), col("__nb")) <=
        lit(2L) * least(col("__na"), col("__nb")))
      out("pj_cand_pairs_len") = lenOk.count()
      val cand = lenOk
        .filter(lit(3L) * (col("__s") +
          least(col("__na") - col("__ia"), col("__nb") - col("__jb"))) >=
          col("__na") + col("__nb"))
        .select(col("doc_a"), col("doc_b"))
        .transform(CacheScope.pinned)
      out("pj_cand_pairs") = cand.count()
      val candDocs = cand.select(col("doc_a").as("doc_id"))
        .union(cand.select(col("doc_b").as("doc_id"))).distinct()
      out("pj_cand_docs") = candDocs.count()
      out("pj_verify_set_input_rows") =
        sh.join(candDocs, Seq("doc_id"), "left_semi").count()
      CacheScope.releaseAll()
    }
    CacheScope.releaseSession()

    println(out.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString(s"""{"sf_dir":"$sfDir",""", ",", "}"))
    spark.stop()
  }
}
