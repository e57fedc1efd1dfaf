package graft.operators

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: star center dominates, mass conserved, symmetry respected") {
    // star: 1 is connected to 2,3,4,5
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("id_a", "id_b")
    val out = Graph.pageRank(star, iterations = 5).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L)._1 == 4L) // degree
    // center collects every leaf's full rank each round
    assert(Seq(2L, 3L, 4L, 5L).forall(l => out(1L)._2 > out(l)._2 * 2))
    // leaves are symmetric
    assert(Seq(3L, 4L, 5L).forall(l => out(l)._2 == out(2L)._2))
    // no dangling nodes -> total mass stays 1
    assert(math.abs(out.values.map(_._2).sum - 1.0) < 1e-4)
  }

  test("pageRank iterations converge toward the stationary ranking") {
    // path 1-2-3: middle node is most central
    val path = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = Graph.pageRank(path, iterations = 8).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(2L) > out(1L) && out(1L) == out(3L))
  }

  test("degrees counts undirected neighbors") {
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val d = Graph.degrees(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == Map(1L -> 2L, 2L -> 1L, 3L -> 1L))
  }

  test("labelPropagation: disjoint cliques converge to their min id; bridged path keeps sides apart") {
    // two disjoint triangles: each converges to its own min label in 3 rounds
    val tris = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (7L, 8L), (8L, 9L), (7L, 9L)).toDF("id_a", "id_b")
    val out = Graph.labelPropagation(tris, rounds = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      7L -> 7L, 8L -> 7L, 9L -> 7L))
  }

  test("triangleCounts: K4 gives 3 per node, a hanging wedge gives none") {
    // K4 on 1..4 (every node in 3 triangles, clustering 1.0) plus a
    // pendant path 4-5, 5-6 (wedge at 5, never closed); edges arrive in
    // both orders and with a duplicate to exercise canonicalization
    val pairs = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (3L, 2L),          // duplicate of (2,3), reversed
      (4L, 5L), (5L, 6L)
    ).toDF("id_a", "id_b")
    val out = Graph.triangleCounts(pairs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out(1L) == ((3L, 3L, 1.0)))
    assert(out(2L) == ((3L, 3L, 1.0)))
    assert(out(3L) == ((3L, 3L, 1.0)))
    // node 4 has degree 4 (K4 + pendant): clustering = 2*3/(4*3) = 0.5
    assert(out(4L) == ((3L, 4L, 0.5)))
    // 5 and 6 are in no triangle -> absent
    assert(!out.contains(5L) && !out.contains(6L))
  }

  test("kCore: peeling strips pendants transitively, keeps the triangle") {
    // triangle 1-2-3 plus a chain 3-4, 4-5: round 1 drops 5 (deg 1),
    // round 2 drops the now-pendant 4 — only the triangle is the 2-core,
    // so a CASCADE needs multiple rounds, not one degree filter
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("id_a", "id_b")
    val out = Graph.kCore(pairs, k = 2, rounds = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out == Map(1L -> ((2L, true)), 2L -> ((2L, true)), 3L -> ((2L, true))))
  }

  test("kCore: too few rounds leaves mid-peel nodes flagged unstable") {
    // a 4-chain peels from both ends over 2 rounds; rounds = 1 leaves the
    // middle edge with degree-1 endpoints -> stable = false signals the
    // round budget was too small (not a converged 2-core)
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val r1 = Graph.kCore(chain, k = 2, rounds = 1).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(r1 == Map(2L -> false, 3L -> false))
    // at convergence the 2-core of a tree is empty
    assert(Graph.kCore(chain, k = 2, rounds = 2).count() == 0)
  }

  test("adamicAdar: rare shared items outweigh popular ones; degree-1 items inert") {
    // item 10: shared by users 1,2 only (deg 2 — strong evidence)
    // item 20: shared by users 1,3,4,5,6,7,8,9 (deg 8 — weak evidence)
    // item 30: only user 1 (deg 1 — no wedge)
    val edges = (Seq((1L, 10L), (2L, 10L), (1L, 30L)) ++
      Seq(1L, 3L, 4L, 5L, 6L, 7L, 8L, 9L).map(u => (u, 20L)))
      .toDF("u", "i")
    val out = Graph.adamicAdar(edges, "u", "i", topN = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    val w2 = 1.0 / math.log(2.0)
    val w8 = 1.0 / math.log(8.0)
    assert(math.abs(out((1L, 2L))._2 - math.rint(w2 * 1e4) / 1e4) < 1e-9)
    assert(math.abs(out((1L, 3L))._2 - math.rint(w8 * 1e4) / 1e4) < 1e-9)
    assert(out((1L, 2L))._2 > out((1L, 3L))._2,
      "the rare shared item must score above the popular one")
    assert(out((3L, 4L))._1 == 1L) // popular-item co-buyers still pair
    assert(!out.keySet.exists { case (a, b) => a >= b }, "pairs are a < b")
  }

  test("adamicAdar: maxItemDegree drops hub evidence before the wedge join") {
    val edges = (Seq((1L, 10L), (2L, 10L)) ++
      Seq(1L, 2L, 3L, 4L, 5L).map(u => (u, 20L))).toDF("u", "i")
    val capped = Graph.adamicAdar(edges, "u", "i", topN = 50, maxItemDegree = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // hub 20 (deg 5 > cap) gone: only the (1,2) pair via item 10 survives
    assert(capped.keySet == Set((1L, 2L)))
    assert(capped((1L, 2L)) == 1L)
  }

  test("bfsHops: min-hop frontier expansion, isolated seeds kept, cap holds") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("id_a", "id_b")
    val seeds = Seq(1L, 9L).toDF("node") // 9 is not in the graph at all
    val out = Graph.bfsHops(pairs, seeds, maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 0L, 9L -> 0L, 2L -> 1L, 3L -> 2L),
      "nodes 4,5 are beyond the 2-hop cap")
    // rounds stop early once a frontier is empty; seeds on both ends
    // meet in the middle with the MIN hop winning
    val all = Graph.bfsHops(pairs, Seq(1L, 5L).toDF("node"), maxHops = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(all == Map(1L -> 0L, 5L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L))
  }

  test("degreeAssortativity: exact moments on a tiny bipartite graph") {
    import spark.implicits._
    // u1-{i1,i2}, u2-{i1}; duplicate rows and nulls must not count
    val edges = Seq(
      (Some(1L), Some(10L)), (Some(1L), Some(10L)), (Some(1L), Some(20L)),
      (Some(2L), Some(10L)), (None, Some(10L)), (Some(2L), None)
    ).toDF("u", "i")
    val r = Graph.degreeAssortativity(edges, "u", "i").collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(r.getDouble(3) == 1.6667 && r.getDouble(4) == 1.6667)
    // (dx,dy) pairs (2,2),(2,1),(1,2): r = (3*8-25)/sqrt(2*2) = -0.5
    assert(r.getDouble(5) == -0.5)
    // flat degrees (a perfect matching) have zero variance: null, not NaN
    val flat = Seq((1L, 10L), (2L, 20L)).toDF("u", "i")
    assert(Graph.degreeAssortativity(flat, "u", "i").collect().head
      .isNullAt(5))
  }
}
