package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair list, in pure DataFrame ops —
  * the step that turns near-duplicate PAIRS (Dedup.minhashPairs and
  * friends) into duplicate CLUSTERS with one canonical document each.
  *
  * Algorithm: iterative minimum-label propagation. Every node starts
  * labeled with its own id; each round replaces a node's label with
  * the minimum over itself and its neighbors' labels; at fixpoint the
  * label is the minimum node id reachable in the component — a
  * deterministic canonical id, independent of iteration schedule.
  *
  * Scale shape: one round = one equi-join of the (symmetrized) edge
  * list against the label frame plus a groupBy-min — both hash
  * shuffles on node id, no driver-side graph. Rounds needed = graph
  * diameter; duplicate clusters are near-cliques (diameter ≈ 1-2), so
  * the loop converges in 2-3 rounds on dedup workloads. The driver
  * loop holds only a changed-row COUNT, never node data. For
  * adversarial long-chain graphs swap in large-star/small-star
  * (O(log n) rounds, same join-shaped building blocks); for dedup
  * output, min-propagation with a diameter-bound iteration cap is the
  * simpler and sufficient tool.
  */
object ConnectedComponents {

  /** Component labels for every node incident to at least one edge:
    * (node, component) where component = min reachable node id.
    * Nodes with no edges are the caller's business (a doc in no pair
    * is its own singleton cluster and needs no join to find out).
    *
    * @param maxIter hard bound on propagation rounds (≥ graph
    *   diameter for exact convergence; the loop exits early the first
    *   round nothing changes)
    * @param numPartitions width of the checkpointed iteration frames.
    *   Size to the EDGE LIST, not the session default: every round's
    *   tasks run over these partitions, so a 32-wide layout on a
    *   thousand-edge graph is pure scheduling overhead, while a
    *   billion-edge graph wants hundreds. None keeps the planner's
    *   width.
    */
  def labelPropagate(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 20,
      numPartitions: Option[Int] = None,
      requireConvergence: Boolean = true): DataFrame = {
    require(maxIter >= 1, "maxIter must be >= 1")
    def width(df: DataFrame, key: String): DataFrame =
      numPartitions.fold(df)(n => df.repartition(n, col(key)))
    // undirected: list each edge both ways, once. localCheckpoint
    // (not persist): each round's plan references the previous
    // round's TWICE (propagation join + convergence count), so
    // without cutting lineage the logical plan doubles per round and
    // analysis itself blows up exponentially — the standard hazard of
    // iterative algorithms on DataFrames, and the reason GraphFrames
    // checkpoints. Checkpoints are LAZY: the convergence-sum action
    // of the same round materializes them, one job per round.
    // materialize the edge input ONCE before symmetrizing: the union
    // references the (possibly expensive — minhash band join) edge
    // plan twice, and without the cut both branches recompute it
    val e0 = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .localCheckpoint(false)
    val sym = width(
      e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
        .distinct(), "src")
      .localCheckpoint(false)
    var labels = width(
      sym
        .select(col("src").as("node"))
        .distinct()
        .withColumn("component", col("node")), "node")
      .localCheckpoint(false)
    // convergence probe: labels only ever DECREASE (least of self and
    // neighbors), so the label sum is strictly decreasing until the
    // fixpoint — an O(1)-row agg replaces a join-and-compare pass
    var labelSum = sumOf(labels)
    var iter = 0
    var converged = false
    // one propagation round: min label among each node's neighbors
    // (join on the edge's src side, aggregate to its dst side), then
    // least(self, neighbors)
    def round(cur: DataFrame): DataFrame = {
      val nbrMin = sym
        .join(cur, sym("src") === cur("node"))
        .groupBy(sym("dst").as("node"))
        .agg(min("component").as("nbr_component"))
      cur
        .join(nbrMin.withColumnRenamed("node", "nbr_node"),
          cur("node") === col("nbr_node"), "left")
        .select(
          cur("node"),
          least(cur("component"), coalesce(col("nbr_component"), cur("component")))
            .as("component"))
    }
    while (iter < maxIter && !converged) {
      // the width() applies to EVERY checkpointed round frame, not
      // just the edge list — otherwise each round's join output (and
      // its checkpoint) re-widens to spark.sql.shuffle.partitions and
      // the knob stops meaning anything
      labels = width(round(labels), "node").localCheckpoint(false)
      val nextSum = sumOf(labels)
      converged = nextSum == labelSum
      labelSum = nextSum
      iter += 1
    }
    // boundary probe: a graph whose fixpoint lands exactly on the
    // maxIter-th round leaves converged=false (the loop never got the
    // confirming equal-sum round). One extra O(1)-row probe — sum of a
    // hypothetical next round, no checkpoint, labels untouched —
    // distinguishes "done at the wire" from "genuinely truncated".
    if (!converged && sumOf(round(labels)) == labelSum) converged = true
    // exhausting maxIter without a fixpoint means some component is
    // split across labels — silently returning that would make dedup
    // keep non-canonical duplicates with no signal anywhere. Callers
    // that WANT a bounded partial propagation (e.g. diameter probes)
    // pass requireConvergence = false.
    if (requireConvergence && !converged) {
      throw new IllegalStateException(
        s"labelPropagate did not converge in maxIter=$maxIter rounds — the " +
          "graph has a component with diameter > maxIter. Raise maxIter " +
          "(rounds needed ≈ the largest component's diameter) or pass " +
          "requireConvergence = false to accept partial labels.")
    }
    labels
  }

  // DECIMAL(38) sum: exact for any realistic id range, so the
  // equal-sum convergence test cannot alias through long overflow
  private def sumOf(labels: DataFrame): java.math.BigDecimal =
    labels
      .agg(coalesce(sum(col("component").cast("decimal(38,0)")), lit(0).cast("decimal(38,0)")))
      .head()
      .getDecimal(0)
}
