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

  /** Adaptive entry point — the API most callers should use when
    * they don't know their graph's diameter: min-label propagation
    * first (the cheaper-per-round winner on near-clique dedup
    * graphs, which converge in 2-3 rounds), falling back to the
    * O(log n)-round [[largeSmallStar]] if propagation hasn't
    * converged within `propagateRounds` — the signature of a
    * long-chain / high-diameter graph, where propagation's
    * O(diameter) rounds are the one curve that bends at corpus
    * scale. Both algorithms produce identical labels, so the
    * fallback is a pure cost decision; the sunk propagation rounds
    * are bounded by the small `propagateRounds` cap.
    */
  def components(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      propagateRounds: Int = 8,
      numPartitions: Option[Int] = None): DataFrame =
    try {
      val out = labelPropagate(edges, srcCol, dstCol, maxIter = propagateRounds,
        numPartitions = numPartitions)
      lastComponentsPath.set("propagate")
      out
    } catch {
      // ONLY the convergence failure routes to the fallback — any
      // other IllegalStateException (stopped context, helper guards)
      // must surface, not silently trigger a full re-run
      case e: IllegalStateException
          if e.getMessage != null && e.getMessage.contains("did not converge") =>
        lastComponentsPath.set("star")
        largeSmallStar(edges, srcCol, dstCol, numPartitions = numPartitions)
    }

  /** Which algorithm the most recent [[components]] call on this JVM
    * resolved to ("propagate" | "star") — a test-observability probe
    * (the adaptive choice is otherwise invisible: both paths emit
    * identical labels by construction). Diagnostics only; never
    * consulted by the operators themselves.
    */
  private[graft] val lastComponentsPath =
    new java.util.concurrent.atomic.AtomicReference[String]("")

  /** Connected components by large-star/small-star alternation
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14) — the O(log n)-round escape hatch [[labelPropagate]]'s
    * docstring names for adversarial long-chain graphs, where plain
    * min-label propagation needs O(diameter) rounds.
    *
    * Same contract as [[labelPropagate]]: returns (node, component)
    * for every node incident to at least one edge, component = min
    * reachable node id — the two algorithms produce IDENTICAL output
    * (ConnectedComponentsSpec pins fixpoint equality on random graphs
    * and chains).
    *
    * Round shape: both half-steps are one groupBy-min over the edge
    * list plus one equi-join back — the same shuffle building blocks
    * as a propagation round, so per-round cost is comparable; the win
    * is ROUND COUNT, which on a path graph drops from n to ~log n.
    * Convergence is detected by exact set equality (count + one
    * anti-join) rather than a checksum: star rounds rewrite edges
    * non-monotonically, so the label-sum probe propagation uses does
    * not apply.
    *
    * When to use which: duplicate clusters are near-cliques (diameter
    * 1-2), where propagation converges in 2-3 cheaper rounds — keep
    * it the dedup default. Chained similarity graphs (A~B~C~… at 100
    * TB corpus scale, where transitive near-dup chains grow with the
    * corpus) have unbounded diameter — use this.
    */
  def largeSmallStar(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 30,
      numPartitions: Option[Int] = None,
      requireConvergence: Boolean = true): DataFrame = {
    require(maxIter >= 1, "maxIter must be >= 1")
    def width(df: DataFrame, key: String): DataFrame =
      numPartitions.fold(df)(n => df.repartition(n, col(key)))
    val e0 = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .localCheckpoint(false)
    // node universe up front: star rounds drop self-loops, so a
    // singleton (self-loop-only) node would otherwise vanish from the
    // edge state and lose its label row
    val nodes = width(
      e0.select(col("src").as("node"))
        .union(e0.select(col("dst").as("node")))
        .distinct(), "node")
      .localCheckpoint(false)
    // working edge SET, kept canonical as (big, small) with big > small
    // — self-loops carry no connectivity and are dropped
    var cur = width(
      e0.filter(col("src") =!= col("dst"))
        .select(
          greatest(col("src"), col("dst")).as("src"),
          least(col("src"), col("dst")).as("dst"))
        .distinct(), "src")
      .localCheckpoint(false)
    var curCount = cur.count()
    var iter = 0
    var converged = curCount == 0L // edgeless graph: all singletons
    // large-star: over the SYMMETRIZED neighborhood of u, connect every
    // strictly-larger neighbor to m = min(Γ(u) ∪ {u}); edges to smaller
    // neighbors are handled in those neighbors' own groups
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      val mins = sym.groupBy(col("src").as("u"))
        .agg(least(min(col("dst")), first(col("src"))).as("m"))
      sym
        .join(mins, sym("src") === col("u"))
        .filter(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
    }
    // small-star: edges already point big→small, so Γ(u) here is the
    // smaller-neighbor set; connect every neighbor AND u itself to
    // m = min(Γ(u) ∪ {u}) = min neighbor
    def smallStar(e: DataFrame): DataFrame = {
      val mins = e.groupBy(col("src").as("u")).agg(min(col("dst")).as("m"))
      val withM = e.join(mins, e("src") === col("u"))
      withM.select(col("dst").as("src"), col("m").as("dst"))
        .union(withM.select(col("src"), col("m").as("dst")))
        .filter(col("src") =!= col("dst"))
        .distinct()
    }
    def isFixpoint(next: DataFrame, nextCount: Long): Boolean =
      // exact fixpoint test: equal cardinality + next ⊆ cur ⇒ equal
      // sets (both sides are distinct). One anti-join per round — star
      // rewrites are not label-monotone, so no cheap sum probe exists.
      nextCount == curCount &&
        next.join(cur, Seq("src", "dst"), "left_anti").isEmpty
    while (iter < maxIter && !converged) {
      val next = width(smallStar(largeStar(cur)), "src").localCheckpoint(false)
      val nextCount = next.count()
      converged = isFixpoint(next, nextCount)
      cur = next
      curCount = nextCount
      iter += 1
    }
    // boundary probe (the labelPropagate rule): a graph whose fixpoint
    // lands exactly on the maxIter-th round leaves converged=false —
    // the loop never got the confirming no-change round. One extra
    // uncheckpointed round distinguishes "done at the wire" from
    // "genuinely truncated".
    if (!converged && iter == maxIter) {
      val probe = smallStar(largeStar(cur))
      if (isFixpoint(probe, probe.count())) converged = true
    }
    if (requireConvergence && !converged) {
      throw new IllegalStateException(
        s"largeSmallStar did not converge in maxIter=$maxIter rounds — " +
          "expected ~log2(n) rounds; raise maxIter or pass " +
          "requireConvergence = false to accept partial labels.")
    }
    // at fixpoint the edge set is a star forest (src = non-root node,
    // dst = its component min); roots and singletons label themselves
    nodes
      .join(cur.withColumnRenamed("src", "node"), Seq("node"), "left")
      .select(col("node"), coalesce(col("dst"), col("node")).as("component"))
  }
}
