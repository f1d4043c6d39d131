package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected pair list via
  * iterative min-label propagation — each round is one distributed join,
  * rounds bounded by component diameter (tiny for near-dup graphs; a
  * diameter > maxIters component fails LOUDLY rather than emitting wrong
  * clusters). Shared by the text (dedup_clusters) and embedding
  * (sim_dup_clusters) duplicate-clustering operators; the oracle twin is a
  * recursive-CTE transitive closure.
  */
object GraphOps {

  /** label every vertex of the (a, b) pair graph with the minimum vertex id
    * of its component; returns (id, cluster) for every vertex that appears
    * in at least one pair */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 50): DataFrame = {
    val edges = pairs.select(col("a"), col("b"))
      .unionByName(pairs.select(col("b").as("a"), col("a").as("b")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select(col("a").as("id")).distinct()
      .select(col("id"), col("id").as("lbl"))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val viaNeighbors = labels
        .join(edges, labels("id") === edges("a"))
        .select(col("b").as("id"), col("lbl"))
      val next = labels.unionByName(viaNeighbors)
        .groupBy("id").agg(min("lbl").as("lbl"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val changed = next.alias("n")
        .join(labels.alias("o"), col("n.id") === col("o.id"))
        .filter(col("n.lbl") =!= col("o.lbl")).count()
      labels.unpersist() // superseded iteration (no-op on the unpersisted seed)
      labels = next
      converged = changed == 0
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents: label propagation did not converge in $maxIters rounds")
    // the converged label frame is materialized; edges are no longer
    // referenced by the returned plan. Final labels back the lazy result,
    // so their release is deferred to CacheTracker.
    edges.unpersist(blocking = false)
    graft.CacheTracker.track(labels)
    labels.select(col("id"), col("lbl").as("cluster"))
  }
}
