package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Graph operators over pair tables. The near-dup family (d2-d5)
  * emits PAIRS, but a dedup pipeline must act on CLUSTERS: if A~B and
  * B~C, keeping "one of each pair" would still keep two of {A,B,C}.
  * Connected components turns the pair graph into (id → component)
  * so exactly one canonical doc survives per transitive cluster —
  * the keep-one-per-cluster step every production dedup run ends with
  * (the cluster-level generalization of the reference's keyed
  * ON CONFLICT DO NOTHING insert, `src/db/incidents.py:41-46`).
  */
object Graph {

  /** Connected components by iterative min-label propagation.
    *
    * Each round every vertex takes the min component label among
    * itself and its neighbors — one shuffle join (messages) plus one
    * partial-agg shuffle (min per vertex) per round, nothing ever
    * leaves the executors. Labels only decrease, so convergence is
    * exact: the loop stops when no label changed (checked with a
    * count action per round, the standard driver-side control for
    * iterative Spark algorithms).
    *
    * Scale shape: rounds = graph diameter. Near-dup graphs are piles
    * of small dense clusters (diameter 2-4), so the round count is
    * tiny and independent of corpus size; each round's cost is one
    * shuffle of O(edges). `localCheckpoint` truncates the logical
    * plan every round so the lineage (and optimizer time) stays O(1)
    * across iterations instead of O(rounds). For adversarial
    * long-chain graphs the large-star/small-star variant converges in
    * O(log n) rounds — near-dup clustering never needs it, so the
    * simpler diameter-bound loop is the right default.
    *
    * Returns (id, component) for every vertex that appears in
    * `pairs`; `component` = min vertex id reachable from `id`.
    */
  def connectedComponents(pairs: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 25): DataFrame = {
    val half = pairs.select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
    // undirected: propagate along both directions of every edge
    val edges = half.union(half.select(col("b").as("a"), col("a").as("b")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select(col("a").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(true)
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      // neighbor messages: each edge (a,b) offers b's current label to a
      val msgs = edges.join(labels.withColumnRenamed("id", "nbr"), col("b") === col("nbr"))
        .select(col("a").as("id"), col("comp"))
      val next = labels.select(col("id"), col("comp")).union(msgs)
        .groupBy("id").agg(min("comp").as("comp"))
        .localCheckpoint(true)
      changed = next.join(labels.withColumnRenamed("comp", "prev"), "id")
        .filter(col("comp") < col("prev")).count()
      labels = next
      iter += 1
    }
    edges.unpersist()
    require(changed == 0, s"connectedComponents did not converge in $maxIter rounds")
    labels
  }

  /** Cluster-level dedup verdict from a pair table: every vertex with
    * its component, the component size, and keep = 1 for the one
    * canonical (min-id) member. Component sizes come from a window
    * over the component key — components are near-dup clusters, so
    * partitions are small and skew-free by construction.
    */
  def clusterDedup(pairs: DataFrame, srcCol: String, dstCol: String,
                   maxIter: Int = 25): DataFrame = {
    val cc = connectedComponents(pairs, srcCol, dstCol, maxIter)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("component")
    cc.select(col("id"), col("comp").as("component"))
      .withColumn("cluster_size", count(lit(1)).over(w))
      .withColumn("keep", when(col("id") === col("component"), 1).otherwise(0))
  }
}
