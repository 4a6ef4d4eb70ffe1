package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Iterative graph analytics over the duplication graph the LSH chain
  * produces ([[Dedup.candidatePairs]]). Connected components (membership)
  * live in [[Dedup]]; this adds CENTRALITY — which documents sit at the
  * core of a duplication neighborhood vs its periphery. The production
  * use is authority-weighted canonical selection and crawl-frontier
  * prioritization: a template page duplicated by thousands of leaves has
  * maximal centrality, and [[Dedup.keepBest]] scored by rank keeps the
  * page the duplication actually radiates from rather than an arbitrary
  * longest member.
  *
  * Scale shape: per iteration ONE keyed join (ranks ⋈ edges on the source
  * vertex) and one sum-groupBy on the destination — the textbook
  * power-iteration shuffle pair, keyed on vertex id throughout; no
  * adjacency ever materializes on the driver. Lineage is truncated per
  * round with a lazy `localCheckpoint` (the [[Dedup.connectedComponents]]
  * discipline — without it round N's plan embeds rounds 1..N−1 and
  * Catalyst re-analysis dwarfs the jobs), and superseded rounds release
  * their blocks immediately.
  *
  * Numerics: ALL-INTEGER fixed point in e12 mass units — rank mass is a
  * BIGINT, every share split and damping step is a floor division, so the
  * result is bit-identical under any partitioning, merge order, or
  * engine (the t15 reassociation discipline; a double-accumulated
  * PageRank's low bits depend on reduce order). Floor remainders simply
  * leave the system (mass is not conserved exactly), which is fine for a
  * RANKING signal and the price of cross-engine exactness.
  */
object Graph {

  /** Damped PageRank over a SYMMETRIC edge frame (`src`, `dst` columns;
    * every vertex must appear as a source — [[Dedup.candidatePairs]]
    * output symmetrized via [[symmetrize]] satisfies both). Fixed
    * `iters` power-iteration rounds, damping 0.85, masses in e12 units:
    *
    *   r₀(v)    = 10¹² ÷ n
    *   rᵢ₊₁(v) = (0.15·10¹²) ÷ n  +  Σ_{u→v} ((rᵢ(u) ÷ deg(u)) · 85) ÷ 100
    *
    * with ÷ integer floor division throughout. Returns
    * (node, r_e12, deg). Overflow-safe: per-edge shares are ≤ 10¹², the
    * damped share ≤ 8.5·10¹³, and a vertex's incoming sum is bounded by
    * the total system mass 10¹² plus base — far inside BIGINT at any n.
    */
  def pagerank(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "pagerank needs at least one iteration")
    import graft.engine.Caches.Registered
    val e = edges.select(col("src"), col("dst")).persistTracked()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg")).persistTracked()
    // Degree folded into the edge frame ONCE — each hop then pays a
    // single keyed join + one sum-groupBy instead of two joins.
    val eDeg = e.join(deg, "src")
      .select(col("src").as("node"), col("dst"), col("deg"))
      .persistTracked()
    // Vertex count rides a one-row broadcast (no driver action): both the
    // uniform init and the per-round teleport base derive from it in-plan.
    val n = deg.agg(count(lit(1)).as("_n"))
    def hop(ranks: DataFrame): DataFrame =
      ranks
        .join(eDeg, "node")
        .select(col("dst").as("node"),
          expr("((r div deg) * 85) div 100").as("c"))
        .groupBy("node").agg(sum("c").as("_in"))
        .crossJoin(broadcast(n))
        .select(col("node"),
          (expr("150000000000 div _n") + col("_in")).as("r"))
    var ranks = deg.select(col("src").as("node")).crossJoin(broadcast(n))
      .select(col("node"), expr("1000000000000 div _n").as("r"))
      .localCheckpoint(false)
    // FIXED iteration count ⇒ no per-round convergence action is needed
    // (unlike connectedComponents, which must inspect a sum every round):
    // chain several hops into ONE job — each driver round-trip costs more
    // than an extra in-job shuffle stage — checkpointing only between
    // chunks to keep the analyzed plan depth bounded.
    val HopsPerAction = 5
    var done = 0
    while (done < iters) {
      val hops = math.min(HopsPerAction, iters - done)
      val next = (1 to hops).foldLeft(ranks)((r, _) => hop(r))
        .localCheckpoint(false)
      next.count() // materialize before releasing the superseded round
      ranks.unpersist()
      ranks = next
      done += hops
    }
    ranks
      .join(deg.withColumnRenamed("src", "node"), "node")
      .select(col("node"), col("r").as("r_e12"), col("deg"))
  }

  /** Per-node triangle census over an undirected pair frame
    * (`doc_a`, `doc_b`): degree, triangles through the node, and local
    * clustering coefficient in e6 units — the transitivity signal that
    * separates a TIGHT duplication clique (template page + mirrors,
    * lcc → 1) from a star-shaped chain of borderline matches (hub
    * lcc → 0), which [[Dedup.keepBest]] alone cannot distinguish.
    *
    * Scale shape: the classic degree-ordered orientation (each
    * undirected edge directed from its (deg, id)-smaller endpoint), so
    * every triangle is enumerated exactly once and — decisively at
    * 100 TB — the wedge join fans out only from each edge's LOW-degree
    * endpoint: a hub of degree d contributes ZERO wedges of its own,
    * bounding the join at m^(3/2) candidates instead of Σd² (which a
    * template page duplicated by thousands of leaves would make
    * quadratic). Three keyed self-joins, no driver-side adjacency.
    *
    * Numerics: lcc_e6 = (2·tri·10⁶) div (deg·(deg−1)) — all-BIGINT
    * floor division, bit-identical cross-engine.
    */
  def triangles(pairs: DataFrame): DataFrame = {
    import graft.engine.Caches.Registered
    val e = pairs
      .select(least(col("doc_a"), col("doc_b")).as("a"),
        greatest(col("doc_a"), col("doc_b")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .persistTracked()
    val deg = e.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("deg"))
      .persistTracked()
    // Orient a—b from the (deg, id)-smaller endpoint. Both endpoint
    // degrees attach via keyed joins (deg is small relative to edges but
    // unbounded — a broadcast would cap corpus size; Catalyst/AQE may
    // still choose one when it fits).
    val aFirst = col("deg_a") < col("deg_b") ||
      (col("deg_a") === col("deg_b") && col("a") < col("b"))
    val dir = e
      .join(deg.select(col("node").as("a"), col("deg").as("deg_a")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("deg_b")), "b")
      .select(when(aFirst, col("a")).otherwise(col("b")).as("src"),
        when(aFirst, col("b")).otherwise(col("a")).as("dst"))
      .persistTracked()
    // Wedges at u: unordered out-neighbor pairs (v < w by id, each pair
    // once); the closing v—w edge is probed in the CANONICAL undirected
    // set (v < w already canonical), so the wedge never needs to know
    // which way degree-order directed it.
    val d2 = dir.select(col("src"), col("dst").as("dst2"))
    val tri = dir.join(d2, "src")
      .filter(col("dst") < col("dst2"))
      .join(e, col("dst") === col("a") && col("dst2") === col("b"), "left_semi")
      .select(col("src").as("x"), col("dst").as("y"), col("dst2").as("z"))
    val triPerNode = tri
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
    deg.join(triPerNode, Seq("node"), "left")
      .withColumn("n_tri", coalesce(col("n_tri"), lit(0L)))
      .select(col("node").as("doc_id"), col("deg"), col("n_tri"),
        when(col("deg") >= 2,
          expr("(2 * n_tri * 1000000) div (deg * (deg - 1))"))
          .otherwise(lit(0L)).as("lcc_e6"))
  }

  /** (doc_a, doc_b) pairs → symmetric (src, dst) edges, in ONE pass over
    * the pair pipeline (a union with the swapped projection would run the
    * expensive upstream LSH chain twice — the
    * [[Dedup.connectedComponents]] explode discipline).
    */
  def symmetrize(pairs: DataFrame): DataFrame =
    pairs.select(explode(array(
      struct(col("doc_a").as("src"), col("doc_b").as("dst")),
      struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
}
