package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives for dedup clustering.
  *
  * Near-dup detection emits PAIRS (MinHash/SimHash candidates,
  * [[DedupQueries]]); a pipeline needs CLUSTERS — "keep one doc per
  * connected component of the similarity graph". At 100 TB the component
  * structure can't live on the driver, so components are computed by
  * iterative min-label propagation over distributed frames: every vertex
  * starts labeled with its own id, each round every vertex takes the min
  * of its own and its neighbors' labels, and the loop stops when no label
  * changes. Each round is one equi-join + one aggregation (both shuffle on
  * the vertex id); rounds needed = component diameter, which for dup
  * clusters (dense near-cliques) is 2-4.
  *
  * The driver orchestrates the loop but holds no graph data — each round's
  * convergence check reads ONE count. This is the standard Pregel-style
  * shape (GraphX's connectedComponents does the same message/min rounds);
  * it is inherently multi-job, unlike the single-plan queries elsewhere in
  * the engine, and [[DedupQueries]]'s `dedup_components` documents that.
  */
object GraphOps {
  /** Connected components of the undirected graph given by `edges`
    * (columns `src`, `dst`). Returns (doc_id, component_id) for every
    * vertex incident to an edge; component_id = min vertex id in the
    * component — a deterministic labeling, independent of partitioning and
    * round count. Fails loudly if `maxIter` rounds don't converge. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .persist()
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .persist()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // neighbor labels flow along edges; min with the vertex's own label
      val neigh = sym.join(labels.select(col("id").as("__nid"), col("label")),
          col("dst") === col("__nid"))
        .select(col("src").as("id"), col("label"))
      val next = labels.select(col("id"), col("label")).union(neigh)
        .groupBy(col("id")).agg(min(col("label")).as("label"))
        .persist()
      val changed = next
        .join(labels.select(col("id"), col("label").as("__old")), Seq("id"))
        .filter(col("label") =!= col("__old")).count()
      labels.unpersist()
      // persist caches data but NOT lineage: by round k the logical plan
      // nests k join+agg layers and Catalyst re-analyzes the whole tree
      // each round (O(k²) planning, eventual stack depth). localCheckpoint
      // truncates the lineage every few rounds so planning cost stays flat
      // for high-diameter graphs.
      labels =
        if ((iter + 1) % 5 == 0) { val cp = next.localCheckpoint(true); next.unpersist(); cp }
        else next
      converged = changed == 0
      iter += 1
    }
    require(converged, s"connectedComponents: no convergence in $maxIter rounds")
    sym.unpersist()
    labels.select(col("id").as("doc_id"), col("label").as("component_id"))
  }
}
