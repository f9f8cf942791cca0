package graft

import graft.operators.SimilarityQueries
import org.apache.spark.sql.functions._

/** Pins the recall trade of `ann_lsh_near_dup`'s two geometries at a
  * fixture where banding actually ENGAGES — the LadderRecallSpec
  * discipline. The driver fixture's planted duplicates are EXACT copies
  * (cosine 1.0 → every signature bit agrees → any geometry scores recall
  * 1.0, vacuously), so this spec builds the corpus the banded rung exists
  * for: each vector plus a deterministically jittered near-copy at
  * cosine ≈ 0.95-0.98, where single-band sign-LSH measurably loses pairs
  * (0.4525 at sf10, bench/SCALING.json note_r12) and the [[SimilarityQueries.LshBands]]
  * banded geometry must recover them. Floors are pinned just under the
  * deterministic measured values. */
class LshBandedRecallSpec extends SparkTestBase {

  test("banded sign-LSH recovers the near-dup pairs the single band loses") {
    val base = Tables.load(spark, Sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    // ±24.5% per-dimension multiplicative jitter with md5-parity signs
    // (deterministic, engine-independent): cos(v, v∘(1+εr)) ≈ 1/√(1+ε²)
    // ≈ 0.971, so the planted pair sits in the near-dup band where sign
    // bits actually flip (p_flip = acos(0.97)/π ≈ 0.08/bit)
    val eps = 0.245
    val jittered = base.select(
      (col("vec_id") + lit(1000000000L)).as("vec_id"),
      expr(
        s"""transform(embedding, (x, i) -> cast(x * (1.0 + $eps *
           |  (CASE WHEN substring(md5(concat(cast(vec_id AS string), ':', cast(i AS string))), 32, 1)
           |        IN ('0','2','4','6','8','a','c','e') THEN 1.0 ELSE -1.0 END)) AS float))""".stripMargin)
        .as("embedding"))
    val corpus = base.unionByName(jittered).transform(CacheScope.cached)

    // exact all-pairs truth at the query's own 0.95 threshold
    val nc = corpus.select(col("vec_id"), col("embedding"),
      graft.functions.QuantizedVec.qnormsq(col("embedding")).as("nsq"))
      .transform(CacheScope.cached)
    val truePairs = nc.select(col("vec_id").as("vec_a"),
        col("embedding").as("emb_a"), col("nsq").as("nsq_a"))
      .join(nc.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"),
        col("nsq").as("nsq_b")), col("vec_a") < col("vec_b"))
      .filter(graft.functions.QuantizedVec.qcosine(col("emb_a"), col("emb_b"),
        col("nsq_a"), col("nsq_b")) >= 0.95)
      .select(col("vec_a"), col("vec_b"))
      .transform(CacheScope.cached)
    val nTrue = truePairs.count()
    assert(nTrue > 50, s"fixture degenerate: only $nTrue true near-dup pairs")

    def recallAt(bands: Int): Double = {
      val found = SimilarityQueries.lshNearDupPairs(corpus, bands)
        .select(col("vec_a"), col("vec_b"))
      truePairs.join(found, Seq("vec_a", "vec_b"), "left_semi").count().toDouble / nTrue
    }
    val single = recallAt(1)
    val banded = recallAt(SimilarityQueries.LshBands)
    info(s"nTrue=$nTrue single=$single banded=$banded")
    // the single band must demonstrably lose pairs here (else the fixture
    // is vacuous and the banded floor means nothing)
    assert(single < 0.8, s"fixture no longer stresses the single band: $single")
    assert(banded > single, s"banding did not lift recall: $banded <= $single")
    // deterministic floor at this geometry (measured, pinned just below)
    assert(banded >= 0.75, s"banded recall regressed: $banded")
    CacheScope.releaseAll()
  }
}
