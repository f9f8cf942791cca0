package graft.operators

import graft.functions.Hashing
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end training-data preparation pipeline, composed from the
  * engine's own operators in one declarative plan: tokenize → content
  * fingerprint → exact-dedup (canonical survivor per fingerprint) →
  * quality gate (minimum token count) → cleaned corpus with provenance
  * (how many copies each survivor represents).
  *
  * The point is compositionality: each stage is the same expression the
  * standalone operators use (`Hashing.tokens`, `dedup_exact`'s md5-keyed
  * window), and Catalyst fuses all of it into scan → project → ONE window
  * shuffle on the 32-byte fingerprint → filter. At 100 TB this whole
  * cleaning pass is a single shuffle of the corpus.
  */
object PipelineQueries {
  type Q = (SparkSession, String) => DataFrame

  val MinTokens = 5

  val queries: Map[String, Q] = Map(
    "pipeline_clean_corpus" -> ((spark, sfDir) => {
      val w = Window.partitionBy(col("__fp"))
      DedupQueries.corpus(spark, sfDir)
        .withColumn("n_tokens", size(Hashing.tokens(col("text"))).cast("long"))
        .withColumn("__fp", md5(col("text")))
        .withColumn("canonical_id", min(col("doc_id")).over(w))
        .withColumn("n_copies", count(lit(1)).over(w))
        .filter(col("doc_id") === col("canonical_id")) // dedup: canonical survives
        .filter(col("n_tokens") >= MinTokens)          // quality gate
        .select(col("doc_id"), col("n_tokens"), col("n_copies"),
          col("__fp").as("fingerprint"))
    }),
    // Deterministic train/val split: route each document by a content-free
    // hash of its id (md5-derived, engine-portable) — the standard
    // reproducible-split primitive. Pure projection + tiny aggregate; at
    // scale the split column also serves as a write partition key.
    "pipeline_train_split" -> ((spark, sfDir) =>
      graft.Tables.load(spark, sfDir, "documents")
        .withColumn("split",
          when(Hashing.hash64(col("doc_id").cast("string")) % 100 < 90, "train")
            .otherwise("val"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars")))
  )

  val oracleSql: Map[String, String] = Map(
    "pipeline_clean_corpus" ->
      s"""WITH corpus AS (
         |${DedupQueries.corpusSql}
         |), t AS (
         |  SELECT doc_id,
         |         CAST(len(${Hashing.tokensSql("text")}) AS BIGINT) AS n_tokens,
         |         md5(text) AS fp,
         |         MIN(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
         |         COUNT(*) OVER (PARTITION BY md5(text)) AS n_copies
         |  FROM corpus)
         |SELECT doc_id, n_tokens, n_copies, fp AS fingerprint
         |FROM t
         |WHERE doc_id = canonical_id AND n_tokens >= $MinTokens""".stripMargin,
    "pipeline_train_split" ->
      s"""SELECT CASE WHEN ${Hashing.hash64Sql("CAST(doc_id AS VARCHAR)")} % 100 < 90
         |            THEN 'train' ELSE 'val' END AS split,
         |  COUNT(*) AS n_docs,
         |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
         |FROM documents
         |GROUP BY 1""".stripMargin
  )
}
