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
}
