package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-iteration graph analytics over pair lists (the near-dup pair
  * output of [[Dedup]] viewed as an undirected graph). Complements
  * [[Dedup.connectedComponents]]'s label fixpoint with a NUMERIC power
  * iteration: PageRank-style centrality, used in curation to pick the most
  * "central" member of a duplicate cluster or weight documents by their
  * connectivity in a citation/link graph.
  */
object Graph {

  /** Per-node degree of an undirected pair list. One shuffle. */
  def degrees(pairs: DataFrame, idA: String = "id_a",
              idB: String = "id_b"): DataFrame =
    pairs.select(col(idA).as("node"))
      .union(pairs.select(col(idB).as("node")))
      .groupBy("node").agg(count(lit(1)).cast("long").as("degree"))

  /** Per-node triangle counts with the local clustering coefficient
    * (2T/d(d−1)) — the "is this near-dup neighborhood a clique or a
    * chain?" diagnostic: template families form dense triangles, chained
    * borrowings don't, and survivor selection can treat them differently.
    *
    * Wedge enumeration runs DEGREE-ORIENTED (each edge points from its
    * lower-(degree, id) endpoint to the higher one): every triangle has
    * exactly one node with two out-edges, so it's found once, and the
    * wedge work is Σ outdeg² where the orientation caps outdeg at
    * O(√edges) even on a star graph — the standard defense against the
    * hub blowup that id-ordered wedges (Σ deg² on the raw degrees) hit at
    * scale. Two self-joins on the oriented edge list, both equi-joins;
    * the edge list is localCheckpoint'd (paid once, read three times).
    * Output is one row per node appearing in ≥1 triangle. The result is
    * orientation-independent, so an oracle can use the naive id-ordered
    * formulation. */
  def triangleCounts(pairs: DataFrame, idA: String = "id_a",
                     idB: String = "id_b"): DataFrame = {
    val und = pairs
      .select(least(col(idA), col(idB)).as("a"),
        greatest(col(idA), col(idB)).as("b"))
      .filter(col("a") =!= col("b")).distinct().localCheckpoint()
    val deg = degrees(und, "a", "b")
    val withDeg = und
      .join(deg.select(col("node").as("a"), col("degree").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("degree").as("db")), "b")
    // orient toward the higher (degree, id) endpoint
    val oriented = withDeg.select(
      when(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")), col("a"))
        .otherwise(col("b")).as("src"),
      when(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")), col("b"))
        .otherwise(col("a")).as("dst"))
      .localCheckpoint()
    // wedges at the common lower endpoint; close with either orientation
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.dst") < col("e2.dst"))
      .select(col("e1.src").as("x"), col("e1.dst").as("y"),
        col("e2.dst").as("z"))
    val closing = und.select(
      least(col("a"), col("b")).as("cy"), greatest(col("a"), col("b")).as("cz"))
    val tri = wedges.join(closing,
      least(col("y"), col("z")) === col("cy") &&
        greatest(col("y"), col("z")) === col("cz"))
      .select(col("x"), col("y"), col("z"))
    val nodeTri = tri
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).cast("long").as("n_triangles"))
    nodeTri.join(deg, "node")
      .select(col("node"), col("n_triangles"), col("degree"),
        round(lit(2.0) * col("n_triangles").cast("double") /
          (col("degree") * (col("degree") - 1)).cast("double"), 4)
          .as("clustering"))
  }

  /** Synchronous label propagation for a FIXED number of rounds: every
    * node starts as its own community and each round adopts the most
    * frequent label among its neighbors, ties to the SMALLEST label — the
    * cheap community detector that, unlike [[Dedup.connectedComponents]],
    * separates densely-knit groups inside one connected component (a
    * bridge edge between two template families doesn't merge them).
    *
    * Fixed rounds + deterministic tie-break keep the result closed-form
    * replayable (an oracle unrolls the same rounds; the same contract as
    * [[pageRank]]). Each round is one edge⋈label join and one two-level
    * aggregation: the (node, label) vote count collapses via
    * `max(struct(cnt, −label))` — max count, then min label — so no rank
    * window ever sorts the vote table. State is one label per node. */
  def labelPropagation(pairs: DataFrame, rounds: Int,
                       idA: String = "id_a", idB: String = "id_b"): DataFrame = {
    require(rounds >= 1 && rounds <= 10, "rounds in [1,10]")
    val edges = pairs.select(col(idA).as("s"), col(idB).as("d"))
      .union(pairs.select(col(idB).as("s"), col(idA).as("d")))
      .distinct().localCheckpoint()
    var labels = edges.select(col("s").as("node")).distinct()
      .withColumn("label", col("node"))
    for (_ <- 1 to rounds) {
      labels = edges
        .join(labels.select(col("node").as("d"), col("label").as("nlabel")), "d")
        .groupBy(col("s"), col("nlabel"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("s"))
        .agg(max(struct(col("cnt"), negate(col("nlabel")).as("nl"))).as("m"))
        .select(col("s").as("node"), negate(col("m.nl")).as("label"))
        .localCheckpoint()
    }
    labels
  }

  /** PageRank by a FIXED number of power iterations over the undirected
    * pair graph: r_0 = 1/N;
    * `r_{k+1}(v) = (1-d)/N + d * sum over neighbors u of r_k(u)/deg(u)`.
    *
    * Each iteration is one join (edges x current ranks) + one aggregation —
    * the canonical scale shape, no windows, state bounded by the node set.
    * A FIXED iteration count (not a convergence test) keeps the result
    * deterministic and replayable by an external engine: every iteration is
    * the same closed-form arithmetic, so an oracle can unroll it. Isolated
    * nodes don't occur (every node comes from a pair). Returns
    * (node, degree, rank 6dp). */
  def pageRank(pairs: DataFrame, iterations: Int, damping: Double = 0.85,
               idA: String = "id_a", idB: String = "id_b"): DataFrame = {
    require(iterations >= 1 && iterations <= 20, "iterations in [1,20]")
    val edges = pairs.select(col(idA).as("src"), col(idB).as("dst"))
      .union(pairs.select(col(idB).as("src"), col(idA).as("dst")))
      .distinct().localCheckpoint()
    val deg = edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).cast("long").as("degree")).localCheckpoint()
    val n = deg.count().toDouble // bounded: node count only
    var ranks = deg.select(col("node"), lit(1.0 / n).as("rank"))
    for (_ <- 1 to iterations) {
      val contribs = edges
        .join(ranks.select(col("node").as("src"), col("rank")), "src")
        .join(deg.select(col("node").as("src"), col("degree")), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") / col("degree")).as("inflow"))
      ranks = deg.select(col("node"))
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit((1.0 - damping) / n) +
            lit(damping) * coalesce(col("inflow"), lit(0.0))).as("rank"))
        .localCheckpoint() // cut the per-iteration lineage growth
    }
    deg.join(ranks, "node")
      .select(col("node"), col("degree"), round(col("rank"), 6).as("rank"))
  }

  /** k-core decomposition by FIXED-round peeling: each round computes
    * degrees over the surviving edge set and drops every node with
    * degree < k (and its edges). After enough rounds the set is stable and
    * equals the true k-core; a fixed round count (like [[pageRank]]'s
    * fixed iterations) keeps the result closed-form replayable — an oracle
    * unrolls the same rounds, and once converged extra rounds are no-ops.
    *
    * Scale shape: each round is one aggregation (degrees) + two
    * semi-joins (edge endpoints against survivors), all keyed on the node
    * id — no windows, no driver collects; the edge set only shrinks, and
    * `localCheckpoint` per round cuts the lineage the same way
    * [[labelPropagation]] does. Rounds needed = peel depth, which is
    * O(log n) on heavy-tailed graphs in practice (degeneracy peels in
    * waves, not one node at a time). Returns surviving (node,
    * core_degree, stable) — `stable` false on any node means `rounds` was
    * too small for this graph (one more peel would still remove nodes). */
  def kCore(pairs: DataFrame, k: Int, rounds: Int,
            idA: String = "id_a", idB: String = "id_b"): DataFrame = {
    require(k >= 1, "k >= 1")
    require(rounds >= 1 && rounds <= 10, "rounds in [1,10]")
    var edges = pairs.select(col(idA).as("s"), col(idB).as("d"))
      .union(pairs.select(col(idB).as("s"), col(idA).as("d")))
      .distinct().localCheckpoint()
    for (_ <- 1 to rounds) {
      val keep = edges.groupBy(col("s")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("s"))
      edges = edges
        .join(keep, "s")
        .join(keep.withColumnRenamed("s", "d"), "d")
        .select("s", "d").localCheckpoint()
    }
    edges.groupBy(col("s").as("node"))
      .agg(count(lit(1)).cast("long").as("core_degree"))
      .withColumn("stable", col("core_degree") >= k)
  }

  /** Adamic–Adar link prediction over a BIPARTITE incidence list
    * (entity, item): for every entity pair sharing ≥1 item, score
    * `Σ_items 1/ln(deg(item))` — common items count, but an item shared by
    * everyone says nearly nothing (its 1/ln(d) → 0), which is the whole
    * point of Adamic–Adar over raw common-neighbor counts. The "which
    * customers buy alike / which docs cite alike" primitive behind
    * collaborative filtering candidates and entity-resolution hints.
    *
    * Scale shape: wedges enumerate through the ITEM side (one self-equi-join
    * on item), so the work is Σ_i d_i² — quadratic only in per-item degree,
    * never in entities. `maxItemDegree` is the hub throttle: items above the
    * cap are dropped BEFORE the join, bounding wedge work at |items|·cap²
    * while discarding only the least-informative evidence (every dropped
    * wedge would have added < 1/ln(cap) to its pair — the exact weights the
    * scoring already argues are noise; the classic log-degree cut in
    * large-scale people-you-may-know pipelines). Degree-1 items generate no
    * wedges and are pruned with the same filter. The cap DEFAULTS to a
    * finite 1024 — uncapped Adamic–Adar is the textbook skew scale-killer
    * (one power-law hub item turns the self-join quadratic on the hottest
    * key), so an unbounded run must be asked for explicitly via
    * `maxItemDegree = Int.MaxValue`, never fallen into. At the default cap
    * every dropped wedge was worth < 1/ln(1024) ≈ 0.144, comfortably inside
    * the noise band of the 4-dp rounded score. The final top-N is a
    * `TakeOrdered` (sort ships N rows per partition, never the pair table),
    * ordered by the ROUNDED score with (id_a, id_b) tie-breaks so the cut
    * is deterministic and engine-replayable despite float summation order.
    *
    * Entity pairs are same-mode (bipartite ⇒ never already adjacent), so no
    * existing-edge anti-join is needed. */
  def adamicAdar(edges: DataFrame, entityCol: String, itemCol: String,
                 topN: Int, maxItemDegree: Int = 1024): DataFrame = {
    require(topN >= 1, "topN >= 1")
    require(maxItemDegree >= 2, "maxItemDegree >= 2")
    val e = edges.select(col(entityCol).as("u"), col(itemCol).as("i"))
      .filter(col("u").isNotNull && col("i").isNotNull)
      .distinct().localCheckpoint() // read thrice: degrees + both join sides
    // NOTE (r18, measured): pinning the wedge join's width to the core
    // count (repartition-by-num on i at the checkpoint scan) LOST 1.5×
    // at the q220 gate — 32-way sort/agg buffers tripled task CPU and GC
    // (9.8 s GC) versus AQE's byte-coalesced ~10 tasks, whose per-task
    // efficiency won despite idle cores. Left to AQE deliberately; the
    // fix that does pay here is the q113-style pin only when a stage is
    // coalesced to ONE task, which this join never is.
    val deg = e.groupBy("i").agg(count(lit(1)).cast("long").as("di"))
      .filter(col("di") >= 2 && col("di") <= maxItemDegree)
    val ew = e.join(deg, "i")
    ew.as("x").join(ew.as("y"),
        col("x.i") === col("y.i") && col("x.u") < col("y.u"))
      .select(col("x.u").as("id_a"), col("y.u").as("id_b"),
        (lit(1.0) / log(col("x.di").cast("double"))).as("w"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).cast("long").as("n_common"),
        round(sum(col("w")), 4).as("score"))
      .orderBy(col("score").desc, col("id_a"), col("id_b"))
      .limit(topN)
  }

  /** Bounded-hop BFS from a seed set over the undirected pair graph:
    * min-hop distance for every node reachable within `maxHops` (seeds at
    * hop 0, isolated seeds included). The neighborhood-expansion
    * primitive behind blast-radius and contamination-spread questions.
    *
    * Pregel-style FRONTIER expansion, not distance-table re-joining: each
    * round joins only the nodes discovered LAST round against the edge
    * list, anti-joins out already-settled nodes, and unions the new hops
    * into the distance set — per-round work is proportional to the
    * frontier × degree, the BFS optimum, and each round is one shuffle
    * join. `localCheckpoint` per round cuts the growing lineage (the
    * same fixed-round contract as [[pageRank]]/[[labelPropagation]]);
    * rounds stop early when a frontier comes back empty. */
  def bfsHops(pairs: DataFrame, seeds: DataFrame, maxHops: Int,
              idA: String = "id_a", idB: String = "id_b"): DataFrame = {
    require(maxHops >= 1 && maxHops <= 12, "maxHops in [1, 12]")
    val edges = pairs.select(col(idA).as("src"), col(idB).as("dst"))
      .union(pairs.select(col(idB).as("src"), col(idA).as("dst")))
      .distinct().localCheckpoint()
    var dist = seeds.select(col(seeds.columns.head).as("node")).distinct()
      .withColumn("hops", lit(0L)).localCheckpoint()
    var frontier = dist
    var k = 1
    var dry = false
    while (k <= maxHops && !dry) {
      val next = frontier.join(edges, col("node") === col("src"))
        .select(col("dst").as("node")).distinct()
        .join(dist.select("node"), Seq("node"), "left_anti")
        .withColumn("hops", lit(k.toLong))
        .localCheckpoint()
      if (next.isEmpty) dry = true
      else {
        dist = dist.unionByName(next).localCheckpoint()
        frontier = next
        k += 1
      }
    }
    dist
  }

  /** Degree assortativity of a bipartite edge list: the Pearson
    * correlation, across DISTINCT edges, between the left endpoint's
    * degree and the right endpoint's degree — "do heavy customers buy
    * popular parts?" Positive r says hubs attach to hubs (rich-club);
    * negative says hubs fan out to the long tail — the single number that
    * predicts whether a hub-join will be skew-on-skew (the q186 preflight
    * question asked of the graph itself).
    *
    * Exactness: degrees are integers, so all five moments (Σx, Σy, Σxy,
    * Σx², Σy²) are exact DECIMAL(38,0) sums and r's numerator/variance
    * terms are exact integers — doubles appear only in the final
    * sqrt-and-divide, written in one fixed order both engines replay.
    * Shape: distinct → two bounded degree aggregates → two equi-joins
    * back to the edge list → one global 5-moment aggregate (map-side
    * combinable, one row out). */
  def degreeAssortativity(edges: DataFrame, leftCol: String,
                          rightCol: String): DataFrame = {
    val e = edges.select(col(leftCol).as("u"), col(rightCol).as("i"))
      .filter(col("u").isNotNull && col("i").isNotNull)
      .distinct().localCheckpoint(eager = false) // degrees + the join spine
    val degL = e.groupBy("u").agg(count(lit(1)).cast("long").as("dx"))
    val degR = e.groupBy("i").agg(count(lit(1)).cast("long").as("dy"))
    val m = e.join(degL, "u").join(degR, "i")
      .agg(count(lit(1)).cast("decimal(38,0)").as("m"),
        sum(col("dx")).cast("decimal(38,0)").as("sx"),
        sum(col("dy")).cast("decimal(38,0)").as("sy"),
        sum(col("dx") * col("dy")).cast("decimal(38,0)").as("sxy"),
        sum(col("dx") * col("dx")).cast("decimal(38,0)").as("sxx"),
        sum(col("dy") * col("dy")).cast("decimal(38,0)").as("syy"),
        countDistinct(col("u")).cast("long").as("n_left"),
        countDistinct(col("i")).cast("long").as("n_right"))
    m.select(col("m").cast("long").as("n_edges"), col("n_left"),
      col("n_right"),
      round(col("sx").cast("double") / col("m").cast("double"), 4)
        .as("mean_deg_left"),
      round(col("sy").cast("double") / col("m").cast("double"), 4)
        .as("mean_deg_right"),
      round(when(
        (col("m") * col("sxx") - col("sx") * col("sx")) === 0 ||
          (col("m") * col("syy") - col("sy") * col("sy")) === 0, null)
        .otherwise(
          (col("m") * col("sxy") - col("sx") * col("sy")).cast("double") /
            sqrt((col("m") * col("sxx") - col("sx") * col("sx"))
              .cast("double") *
              (col("m") * col("syy") - col("sy") * col("sy"))
              .cast("double"))), 4).as("assortativity"))
  }
}
