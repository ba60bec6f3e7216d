package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ConnectedComponents

class ConnectedComponentsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents
      .labelPropagate(edges.toDF("a", "b"), "a", "b")
      .collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("component"))
      .toMap
  }

  /** Reference union-find on the driver. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // canonicalize to min-of-component
    val roots = parent.keys.map(k => k -> find(k)).toMap
    val minOf = roots.groupBy(_._2).map { case (r, m) => r -> m.keys.min }
    roots.map { case (k, r) => k -> minOf(r) }
  }

  test("two components, one a chain needing several propagation rounds") {
    // chain 10-9-8-…-1 (diameter 9) + triangle 100-101-102
    val chain = (1L until 10L).map(i => (i + 1, i))
    val tri = Seq((100L, 101L), (101L, 102L), (100L, 102L))
    val got = components(chain ++ tri)
    (1L to 10L).foreach(n => assert(got(n) == 1L, s"node $n"))
    Seq(100L, 101L, 102L).foreach(n => assert(got(n) == 100L, s"node $n"))
  }

  test("agrees with union-find on random graphs") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 60
      val edges = Seq.fill(70)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      assert(components(edges) == unionFind(edges), s"trial $trial")
    }
  }

  test("maxIter exhaustion throws by default, returns partial labels when opted in") {
    import spark.implicits._
    val chain = (1L until 10L).map(i => (i + 1, i))
    // default: silent wrong labels are worse than an error
    val e = intercept[IllegalStateException] {
      ConnectedComponents.labelPropagate(chain.toDF("a", "b"), "a", "b", maxIter = 2)
    }
    assert(e.getMessage.contains("did not converge"))
    // opted in: after 2 rounds node 10 has only seen labels within distance 2
    val capped = ConnectedComponents
      .labelPropagate(chain.toDF("a", "b"), "a", "b", maxIter = 2,
        requireConvergence = false)
      .collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("component"))
      .toMap
    assert(capped(10L) > 1L)
  }

  private def starComponents(
      edges: Seq[(Long, Long)], maxIter: Int = 30): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents
      .largeSmallStar(edges.toDF("a", "b"), "a", "b", maxIter = maxIter)
      .collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("component"))
      .toMap
  }

  test("large-star/small-star agrees with union-find and propagation on random graphs") {
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 3) {
      val n = 60
      val edges = Seq.fill(70)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val expect = unionFind(edges)
      assert(starComponents(edges) == expect, s"trial $trial vs union-find")
      assert(components(edges) == expect, s"trial $trial vs propagation")
    }
  }

  test("large-star/small-star labels a long chain in O(log n) rounds") {
    // path 1-2-…-200: propagation needs 199 rounds, the star
    // alternation must finish inside 12 (≈ log2 + slack) — the round
    // cap IS the assertion, via requireConvergence
    val chain = (1L until 200L).map(i => (i + 1, i))
    val got = starComponents(chain, maxIter = 12)
    (1L to 200L).foreach(n => assert(got(n) == 1L, s"node $n"))
  }

  test("large-star/small-star handles singletons, self-loops and duplicate edges") {
    // self-loop-only node 42 keeps its label row; duplicate and
    // reversed edges collapse; two separate pairs stay separate
    val edges = Seq((42L, 42L), (1L, 2L), (2L, 1L), (1L, 2L), (7L, 8L))
    assert(starComponents(edges) ==
      Map(42L -> 42L, 1L -> 1L, 2L -> 1L, 7L -> 7L, 8L -> 7L))
  }

  test("components() adapts: propagation on shallow graphs, star fallback on deep chains") {
    import spark.implicits._
    def comp(edges: Seq[(Long, Long)], rounds: Int) =
      ConnectedComponents
        .components(edges.toDF("a", "b"), "a", "b", propagateRounds = rounds)
        .collect()
        .map(r => r.getAs[Long]("node") -> r.getAs[Long]("component"))
        .toMap
    // triangle: diameter 1, propagation path suffices
    assert(comp(Seq((5L, 6L), (6L, 7L), (5L, 7L)), 8) ==
      Map(5L -> 5L, 6L -> 5L, 7L -> 5L))
    // 100-node chain with a 4-round cap: propagation throws, the star
    // fallback must deliver the same labels anyway
    val chain = (1L until 100L).map(i => (i + 1, i))
    val got = comp(chain, 4)
    (1L to 100L).foreach(n => assert(got(n) == 1L, s"node $n"))
  }

  test("large-star/small-star fixpoint reached exactly at maxIter counts as converged") {
    // path 1-2-3: round 1 rewrites {(2,1),(3,2)} to the star
    // {(2,1),(3,1)} — the FIXPOINT — but the confirming no-change
    // round would be round 2, so maxIter = 1 exits the loop
    // unconverged and the boundary probe must rescue it
    val got = starComponents(Seq((1L, 2L), (2L, 3L)), maxIter = 1)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("large-star/small-star maxIter exhaustion throws by default") {
    val chain = (1L until 200L).map(i => (i + 1, i))
    val e = intercept[IllegalStateException] {
      starComponents(chain, maxIter = 2)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("fixpoint reached exactly at maxIter counts as converged (boundary probe)") {
    import spark.implicits._
    // path 1-2-3-4: propagation needs exactly 3 rounds (node 4 learns
    // label 1 in round 3), so maxIter = 3 exits the loop without the
    // confirming equal-sum round — the probe must rescue it from a
    // spurious non-convergence error
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val labels = ConnectedComponents
      .labelPropagate(path.toDF("a", "b"), "a", "b", maxIter = 3)
      .collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("component"))
      .toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }
}
