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

  /** Connected components by BLOCK-UNROLLED min-label propagation.
    *
    * Each propagation round takes, per vertex, the min component
    * label over itself and its neighbors — one shuffle join
    * (messages) plus one partial-agg shuffle (min per vertex).
    * `blockRounds` rounds are composed LAZILY into a single plan and
    * materialized with ONE action (`localCheckpoint`): Spark executes
    * the whole block as one job, so the per-round cost is a pipeline
    * stage, not a scheduled job — driver round-trip latency is paid
    * once per block instead of once per round (measured 3-10× on the
    * sf0.1 near-dup graph, where per-round actions dominated).
    *
    * Labels only decrease and a zero-change block implies a stable
    * labeling (label(v) = min over closed neighborhood ⇒ labels are
    * constant along every path ⇒ label = component min), so the
    * convergence check — one cheap filter+count on the checkpointed
    * block result — is exact, never heuristic.
    *
    * Scale shape: total rounds = graph diameter; near-dup graphs are
    * piles of small dense clusters (diameter 2-4 — one block), and
    * even the chattiest sf0.1 graph converges in ~3 blocks. Each
    * round shuffles O(edges). `localCheckpoint` per block keeps
    * lineage O(blockRounds), bounded across iterations. For
    * adversarial chain graphs, raise `maxRounds`; the block structure
    * keeps even 100-round convergence at ~13 jobs.
    *
    * Returns (id, component) for every vertex that appears in
    * `pairs`; `component` = min vertex id reachable from `id`.
    */
  def connectedComponents(pairs: DataFrame, srcCol: String, dstCol: String,
                          maxRounds: Int = 64, blockRounds: Int = 8): DataFrame = {
    val half = pairs.select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
    // undirected (both directions) PLUS a self-loop per vertex: the
    // self-loop folds "keep my own label" into the same join, so each
    // unrolled round references the running labels EXACTLY ONCE — a
    // `cur.union(msgs(cur))` formulation references it twice, which
    // doubles the lazy plan per level and recomputes round 1 2^blockRounds
    // times (measured: 83 s vs 1.5 s at sf0.1). Pre-partitioning by the
    // join key means every round's join reuses this layout; only the
    // slim label table reshuffles per round.
    val verts = half.select(col("a").as("id")).union(half.select(col("b").as("id"))).distinct()
    val edges = half
      .union(half.select(col("b").as("a"), col("a").as("b")))
      .union(verts.select(col("id").as("a"), col("id").as("b")))
      .repartition(col("b"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = verts.withColumn("comp", col("id")).localCheckpoint(true)
    var rounds = 0
    var changed = 1L
    while (changed > 0 && rounds < maxRounds) {
      var cur = labels
      for (_ <- 0 until blockRounds)
        cur = edges.join(cur, col("b") === col("id"))
          .select(col("a").as("id"), col("comp"))
          .groupBy("id").agg(min("comp").as("comp"))
      val next = cur.withColumnRenamed("comp", "newcomp")
        .join(labels.withColumnRenamed("comp", "prev"), "id")
        .select(col("id"), col("newcomp").as("comp"), col("prev"))
        .localCheckpoint(true)
      changed = next.filter(col("comp") < col("prev")).count()
      labels = next.select("id", "comp")
      rounds += blockRounds
    }
    edges.unpersist()
    require(changed == 0, s"connectedComponents did not converge in $maxRounds rounds")
    labels
  }

  /** The deduped corpus itself: every document that is NOT a
    * non-canonical member of some near-dup cluster. This is the
    * pipeline's end use — pair generators (d2-d5) feed
    * [[clusterDedup]], and the left-anti join drops all but one doc
    * per transitive cluster while untouched docs pass through.
    * Scale shape: one anti-join on the id, broadcast-able because the
    * drop list is bounded by the duplicate count, not the corpus.
    */
  def dropNearDups(docs: DataFrame, idCol: String, pairs: DataFrame,
                   srcCol: String, dstCol: String): DataFrame = {
    val drop = clusterDedup(pairs, srcCol, dstCol)
      .filter(col("keep") === 0).select(col("id").as("__drop_id"))
    docs.join(drop, docs(idCol) === col("__drop_id"), "left_anti")
  }

  /** Cluster-level dedup verdict from a pair table: every vertex with
    * its component, the component size, and keep = 1 for the one
    * canonical (min-id) member. Component sizes come from a window
    * over the component key — components are near-dup clusters, so
    * partitions are small and skew-free by construction.
    */
  def clusterDedup(pairs: DataFrame, srcCol: String, dstCol: String,
                   maxRounds: Int = 64): DataFrame = {
    val cc = connectedComponents(pairs, srcCol, dstCol, maxRounds)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("component")
    cc.select(col("id"), col("comp").as("component"))
      .withColumn("cluster_size", count(lit(1)).over(w))
      .withColumn("keep", when(col("id") === col("component"), 1).otherwise(0))
  }
}
