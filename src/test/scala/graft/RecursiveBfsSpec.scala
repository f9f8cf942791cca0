package graft

import graft.operators.GraphOps
import org.apache.spark.sql.functions._

/** Pins that the frontier BFS (the engine's scale path: per-hop work
  * bounded by the edge count) computes exactly the answer of the
  * declarative recursive-CTE form (Spark 4's native WITH RECURSIVE, the
  * same SQL text the DuckDB oracle runs) — on the real fixture pair graph
  * and on adversarial shapes where the two differ most in WORK: dense
  * cliques (path enumeration is d⁴ per seed, frontier is linear) and
  * multi-path diamonds (MIN(hop) must pick the shortest). */
class RecursiveBfsSpec extends SparkTestBase {

  private def hopSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def comparedOn(pairs: org.apache.spark.sql.DataFrame): Unit = {
    val frontier = hopSet(GraphOps.bfsHops(spark, pairs))
    val recursive = hopSet(GraphOps.bfsHopsRecursiveCte(spark, pairs))
    assert(frontier == recursive && frontier.nonEmpty)
    CacheScope.releaseAll()
  }

  test("frontier BFS equals the native recursive CTE on the fixture pair graph") {
    comparedOn(SparkEntry.queries("dedup_simhash_pairs")(spark, Sf)
      .select(col("doc_a"), col("doc_b")))
  }

  test("frontier BFS equals the recursive CTE on a dense clique") {
    import spark.implicits._
    // K12 with one seed (id 0): the CTE walk materializes ~11^4 paths,
    // the frontier visits 12 vertices — answers must be identical
    val clique = (for {
      a <- 0L until 12L; b <- (a + 1) until 12L
    } yield (a, b)).toDF("doc_a", "doc_b")
    comparedOn(clique)
  }

  test("frontier BFS picks MIN hop on multi-path diamonds") {
    import spark.implicits._
    // 0→1→2→3→4 chain plus a 0→4 shortcut: vertex 4 is reachable at hop 4
    // (chain) and hop 1 (shortcut); both forms must report 1. Vertex 9
    // hangs off 4 (hop 2 via shortcut, hop 5 — beyond bound — via chain).
    val diamond = Seq(
      (0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (0L, 4L), (4L, 9L)
    ).toDF("doc_a", "doc_b")
    val hops = hopSet(GraphOps.bfsHops(spark, diamond)).toMap
    assert(hops(4L) == 1L && hops(9L) == 2L && hops(0L) == 0L)
    comparedOn(diamond)
  }
}
