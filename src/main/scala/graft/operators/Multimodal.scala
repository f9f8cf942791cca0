package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat media payloads as opaque `binary`
  * columns with typed metadata and run a per-partition "decode / feature
  * extract" stage.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB ([[Multimodal.stubDecode]]) — it
  * derives fake width/height from an md5 of the payload bytes. Everything
  * around it is the real 100 TB-shape pipeline: a `binary` payload column,
  * a typed `Dataset[MediaFeature]`, and `mapPartitions` with per-partition
  * decoder initialization (where a codec/model handle would be opened once
  * per task, then stream the partition's rows through it — the Scala
  * analogue of a batched `mapInPandas` UDF).
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  /** Typed feature row produced by the decode stage. */
  final case class MediaFeature(
      doc_id: Long, n_bytes: Long, width: Long, height: Long, fingerprint: String)

  /** STUB decoder: a real implementation would decode the media payload
    * here (JPEG dims, audio duration, frame samples). Deterministic fake:
    * dimensions from the payload's md5. */
  def stubDecode(md: java.security.MessageDigest, id: Long, bytes: Array[Byte]): MediaFeature = {
    md.reset()
    val hex = md.digest(bytes).map("%02x".format(_)).mkString
    val h = java.lang.Long.parseLong(hex.take(15), 16)
    MediaFeature(id, bytes.length.toLong, 16 + h % 240, 16 + (h / 240) % 240, hex)
  }

  /** The decode pipeline: binary payload column → per-partition decoder →
    * typed features. Narrow (no shuffle); partitioning is inherited from
    * the scan, so at scale it parallelizes with the input splits. */
  def decodeFeatures(spark: SparkSession, docs: DataFrame): Dataset[MediaFeature] = {
    import spark.implicits._
    docs
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init: stands in for opening a codec/model handle
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) => stubDecode(md, id, bytes) }
      }
  }

  val queries: Map[String, Q] = Map(
    "mm_decode_features" -> ((spark, sfDir) =>
      decodeFeatures(spark, Tables.load(spark, sfDir, "documents")).toDF()),
    // metadata aggregation over the decoded features (typed Dataset → agg)
    "mm_feature_stats" -> ((spark, sfDir) =>
      decodeFeatures(spark, Tables.load(spark, sfDir, "documents")).toDF()
        .groupBy((col("width") % 4).as("width_bucket"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_bytes")).as("total_bytes"),
          max(col("height")).as("max_height")))
  )

  val oracleSql: Map[String, String] = Map(
    "mm_decode_features" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        |       16 + (h % 240) AS width, 16 + ((h // 240) % 240) AS height,
        |       fp AS fingerprint
        |FROM (SELECT doc_id, text, md5(text) AS fp,
        |             CAST(concat('0x', substr(md5(text),1,15)) AS BIGINT) AS h
        |      FROM documents) t""".stripMargin,
    "mm_feature_stats" ->
      """SELECT width_bucket, COUNT(*) AS n, CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
        |       MAX(height) AS max_height
        |FROM (
        |  SELECT (16 + (h % 240)) % 4 AS width_bucket,
        |         octet_length(encode(text)) AS n_bytes,
        |         16 + ((h // 240) % 240) AS height
        |  FROM (SELECT CAST(concat('0x', substr(md5(text),1,15)) AS BIGINT) AS h, text
        |        FROM documents) t1) t2
        |GROUP BY width_bucket""".stripMargin
  )
}
