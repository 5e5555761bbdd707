package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives for dedup pipelines (SURVEY.md §2.11).
  *
  * `connectedComponents` is hash-to-min label propagation — the
  * shuffle-minimal CC algorithm for short-diameter graphs (near-dup
  * clusters are shallow): per iteration one equi-join (edges ⋈
  * labels, shuffled on the edge endpoint) and one min-combine
  * groupBy, converging in diameter(G) rounds. `localCheckpoint`
  * truncates plan lineage each round so iteration N doesn't re-derive
  * rounds 1..N-1; the per-round convergence count is a single scalar
  * action. At 100 TB the same loop holds: labels and edges shuffle
  * on node id, state per node is one long.
  */
object Graphs {

  /** Assign each node the smallest node id reachable through
    * undirected edges. Output: (idCol, cluster_id). Nodes absent from
    * `edges` keep their own id (singleton clusters). */
  def connectedComponents(nodes: DataFrame, idCol: String,
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 30): DataFrame = {
    // materialize the undirected edge list ONCE: every iteration runs
    // two jobs over it (label join + convergence count), and the
    // caller's edge plan is often an expensive similarity join that
    // must not be re-derived 2x per round
    val und = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .localCheckpoint()
    var labels = nodes.select(col(idCol).as("id"))
      .withColumn("lbl", col("id")).localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val nbrMin = und
        .join(labels.select(col("id").as("src"), col("lbl")), "src")
        .groupBy(col("dst"))
        .agg(min(col("lbl")).as("nbr_min"))
        .withColumnRenamed("dst", "id")
      val next = labels
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("lbl"), coalesce(col("nbr_min"), col("lbl"))).as("lbl"))
        .localCheckpoint()
      val nChanged = next.as("n").join(labels.as("o"), "id")
        .filter(col("n.lbl") =!= col("o.lbl")).count()
      labels = next
      converged = nChanged == 0
      iter += 1
    }
    // a silent cap would emit a plausible-looking but WRONG labeling
    // (multiple cluster_ids inside one component) — fail instead
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter iterations " +
          "(component min-id eccentricity exceeds maxIter); raise maxIter")
    labels.select(col("id").as(idCol), col("lbl").as("cluster_id"))
  }
}
