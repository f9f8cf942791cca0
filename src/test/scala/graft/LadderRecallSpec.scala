package graft

import graft.operators.SimilarityQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins the √K probe fan-out ladder ([[SimilarityQueries.nprobeFor]]) at a
  * geometry where it actually ENGAGES. Every DuckDB-gated fixture (and
  * sf1) has K = 10 fine lists, where `nprobeFor` is bit-identical to the
  * fixed NProbe = 4 — so without this fixture zero tests exercise the
  * ladder, the round-11 fix for the measured sf10 recall decay (0.87 sf1
  * → 0.38 sf10 with the fixed fan-out). 40k vectors ⇒ K = 20 lists,
  * nprobeFor(20) = 5 > NProbe: the smallest decade past the ladder's
  * activation threshold, cheap enough for the suite. The corpus is the
  * sf0.1 fixture inflated 20× with the ScaleUp replica arithmetic
  * (deterministic perturbation, cluster structure preserved), built
  * in-memory — no disk fixture needed.
  */
class LadderRecallSpec extends SparkTestBase {

  private val Factor = 20L
  private val Sf01 = "/root/testdata/sf0.1"

  /** sf0.1 embeddings × 20 replicas — the ScaleUp inflation
    * (`ScaleUp.scala`: key stride + per-replica deterministic float
    * perturbation), reproduced in-memory. */
  private def corpus40k: DataFrame = {
    val base = Tables.load(spark, Sf01, "embeddings")
    val strideKey = 1000000L // well past sf0.1's max vec_id
    base.withColumn("__r", explode(sequence(lit(0L), lit(Factor - 1L))))
      .withColumn("vec_id", col("vec_id") + col("__r") * lit(strideKey))
      .withColumn("embedding", when(col("__r") === 0, col("embedding")).otherwise(
        expr("transform(embedding, (x, i) -> cast(x + " +
          "((vec_id * 31 + i * 7 + __r * 13) % 201 - 100) * 0.002 AS float))")))
      .drop("__r")
  }

  test("ladder engages above K = 16 and stays inert below") {
    assert(SimilarityQueries.nprobeFor(10) == SimilarityQueries.NProbe.toLong)
    assert(SimilarityQueries.nprobeFor(16) == SimilarityQueries.NProbe.toLong)
    assert(SimilarityQueries.nprobeFor(20) == 5L)
    assert(SimilarityQueries.nprobeFor(100) == 10L)
    assert(SimilarityQueries.nprobeFor(1000) == 32L)
  }

  test("sampled-IVF recall@10 at the K=20 geometry where the ladder engages") {
    val raw = corpus40k.transform(CacheScope.cached)
    val n = raw.count()
    assert(graft.operators.SimilarityQueries.TopK == 10)
    // the geometry this spec exists for: K > 16 ⇒ the √K rule widens
    val k = n / SimilarityQueries.IvfListTarget
    assert(k > 16, s"fixture too small to engage the ladder (K=$k)")

    // exact cosine top-10 baseline over the same corpus, same stride
    val stride = SimilarityQueries.probeStride(n)
    val withN = raw.select(col("vec_id"), col("embedding"),
      graft.functions.QuantizedVec.qnormsq(col("embedding")).as("nsq"))
      .transform(CacheScope.cached)
    val probes = withN.filter(col("vec_id") % stride === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"),
        col("nsq").as("p_nsq"))
    val exact = broadcast(probes)
      .join(withN, col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        graft.functions.QuantizedVec.qcosine(col("p_emb"), col("embedding"),
          col("p_nsq"), col("nsq")).as("cos"))
      .withColumn("rank", row_number().over(Window.partitionBy(col("probe_id"))
        .orderBy(col("cos").desc, col("neighbor_id"))))
      .filter(col("rank") <= SimilarityQueries.TopK)
      .select(col("probe_id"), col("neighbor_id"))
      .transform(CacheScope.cached)

    val approx = SimilarityQueries.ivfSampledTopk(raw, n)
      .select(col("probe_id"), col("neighbor_id"))
    val nExact = exact.count()
    val hit = exact.join(approx, Seq("probe_id", "neighbor_id"), "left_semi").count()
    val recall = hit.toDouble / nExact
    info(f"K=$k ladder recall@10 = $recall%.3f ($hit/$nExact)")
    assert(nExact > 0)
    // measured 0.820 with the ladder (nprobe 5/20 = 25% probed) — the
    // floor pins the ladder's engagement with headroom for sampling
    // jitter
    assert(recall >= 0.6, f"ladder-geometry recall $recall%.3f below 0.6")
    CacheScope.releaseAll()
  }
}
