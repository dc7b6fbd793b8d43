package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph computation over relational frames — PageRank-style
  * importance propagation on an edge list, the curation signal a
  * training-data pipeline runs over its document/embedding similarity
  * graph (rank-by-connectivity: hubs of a near-dup cluster, canonical
  * pages in a link graph).
  *
  * Everything runs in INTEGER micro-units (rank 1.0 ≡ 1 000 000), with
  * floor division at the two places a real-valued PageRank divides
  * (`r/outdeg`, damping `0.85·x` as `85·x div 100`): integer sums are
  * associative and order-free, so the result is bit-identical across
  * partitionings, retries, AND engines — the property that lets the
  * DuckDB oracle replay the iteration verbatim (the repo's micro-nat
  * discipline applied to an iterative algorithm). Dangling mass is NOT
  * redistributed (it decays — the damping term keeps every rank ≥
  * 150 000), which is a documented, deterministic variant.
  *
  * Scale shape: the edge list with out-degrees attached is cut ONCE
  * (`Checkpoints.cut` — every iteration re-reads a materialized frame
  * instead of re-deriving the graph, the §5 class-(b) knob); each
  * iteration is one join of ranks onto edges (shuffle on src) and one
  * aggregation onto dst (shuffle on dst) — the canonical 2-exchange
  * Pregel superstep as Catalyst sees it. Iteration count is a fixed
  * small constant (rank signals converge in a handful of rounds; the
  * caller owns the dial), so plan depth stays bounded.
  */
object Graph {

  /** One micro-unit rank point: 1.0 ≡ 10^6. */
  val RankOne: Long = 1000000L
  /** Damping 0.85 as the integer pair (85, 100). */
  val DampNum = 85L
  val DampDen = 100L
  /** Teleport term (1 - 0.85) in micro-units. */
  val Teleport: Long = 150000L

  /** PageRank over `edges` (columns `src`, `dst`) for every node in
    * `nodes(idCol)`: (vec_id, rank_micro) after `iters` supersteps from
    * a uniform start of [[RankOne]]. Nodes absent from the edge list
    * still rank (they hold the teleport floor); edges pointing at
    * non-nodes contribute mass that simply lands on those ids' absence
    * (they are not emitted — output is exactly the node set).
    */
  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int,
               idCol: String = "vec_id"): DataFrame = {
    require(iters >= 1 && iters <= 20,
      s"pageRank: iters must be in [1, 20], got $iters")
    val ids = nodes.select(col(idCol).as("vec_id"))
    // out-degree attaches once; the cut stops every iteration from
    // re-running the (potentially expensive) edge derivation upstream.
    // Repartition by src BEFORE the cut: localCheckpoint preserves the
    // physical partitioning, so every superstep's ranks⨝graph join
    // shuffles ONLY the (small) rank frame — the edge list, the big
    // side at 100 TB, stays put across all iterations.
    val graph = graft.config.Checkpoints.cut(
      edges.select(col("src"), col("dst"))
        .join(edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg")),
          Seq("src"))
        .repartition(col("src")))
    var ranks = ids.withColumn("r", lit(RankOne))
    for (i <- 1 to iters) {
      val contrib = graph
        .join(ranks.select(col("vec_id").as("src"), col("r")), Seq("src"))
        .select(col("dst"), expr("r div outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("cin"))
      // the node set rides the RANK frame (not a fresh `ids` scan per
      // superstep): each iteration consumes only the previous one
      ranks = ranks.select(col("vec_id"))
        .join(contrib, col("vec_id") === col("dst"), "left")
        .select(col("vec_id"),
          (lit(Teleport) +
            expr(s"coalesce(cin, 0) * $DampNum div $DampDen")).as("r"))
      // deep iteration counts would otherwise stack an unbounded lineage
      // tree (analysis cost and recompute amplification on a lost
      // executor); a cut every 4 supersteps bounds both while keeping
      // the short gate configurations single-job
      if (i % 4 == 0 && i < iters)
        ranks = graft.config.Checkpoints.cut(ranks)
    }
    ranks.select(col("vec_id"), col("r").as("rank_micro"))
  }

  /** Exact triangle count + local clustering coefficient per node over
    * the UNDIRECTED closure of `edges` (src, dst) — the cohesion signal
    * a curation pipeline reads off its similarity graph (a node whose
    * neighbours also neighbour each other sits inside a dense near-dup
    * community; a hub with lcc≈0 bridges unrelated clusters).
    *
    * Algorithm: compact-forward / node-iterator with DEGREE ordering.
    * Each undirected edge is oriented from its (degree, id)-smaller
    * endpoint to the larger; a triangle {u<v<w} in that total order is
    * found exactly once as wedge u→v→w closed by u→w. Degree ordering
    * bounds every node's oriented out-degree by O(√m), so the wedge
    * join materializes O(m^1.5) rows worst-case instead of Σ deg² —
    * the difference between a skewed hub exploding the shuffle and a
    * bounded pair space at 100 TB. Per-node counts and
    * `lcc_micro = 2·tri·10^6 div (deg·(deg−1))` are integer arithmetic
    * over exact counts, so the result is partitioning- and ENGINE-exact
    * (the micro-nat discipline), and orientation-invariance means the
    * oracle does not even need the same tie-break to agree — it uses
    * the identical one anyway ([[trianglesDuckdbSql]]).
    *
    * Scale shape: one distinct (exchange on the canonical pair), one
    * degree agg, the wedge self-join keyed on the middle vertex, one
    * semi-style closing join on the (u, w) pair, then a 3-way corner
    * union aggregated by node. The oriented frame is cut once and
    * reused by all three consumers.
    */
  def triangles(edges: DataFrame): DataFrame = {
    // undirected closure: canonical (a < b) pairs, self-loops dropped,
    // parallel/reciprocal edges collapsed. Cut: the (potentially
    // expensive) edge derivation upstream runs ONCE — `und` feeds the
    // degree agg and the orientation join
    val und = graft.config.Checkpoints.cut(edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct())
    // |V|-row frame consumed three times (both orientation sides + the
    // final join) — cut so the degree agg runs once
    val deg = graft.config.Checkpoints.cut(
      und.select(col("a").as("x"))
        .unionAll(und.select(col("b").as("x")))
        .groupBy(col("x")).agg(count(lit(1)).as("deg")))
    // total order: rank = deg·2^32 + id (ids are 32-bit; the composite
    // fits a BIGINT and both engines compare it as plain integers)
    val rk = (d: org.apache.spark.sql.Column, id: org.apache.spark.sql.Column) =>
      d * lit(4294967296L) + id
    val oriented = graft.config.Checkpoints.cut(und
      .join(deg.select(col("x").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("x").as("b"), col("deg").as("db")), Seq("b"))
      .select(
        when(rk(col("da"), col("a")) < rk(col("db"), col("b")), col("a"))
          .otherwise(col("b")).as("u"),
        when(rk(col("da"), col("a")) < rk(col("db"), col("b")), col("b"))
          .otherwise(col("a")).as("v")))
    val tris = oriented.select(col("u"), col("v"))
      .join(oriented.select(col("u").as("v"), col("v").as("w")), Seq("v"))
      .join(oriented.select(col("u"), col("v").as("w")), Seq("u", "w"))
      .select(col("u"), col("v"), col("w"))
    // ONE pass over the (possibly huge) triangle stream: explode the
    // three corners instead of a 3-branch union that would re-run the
    // wedge joins per branch (and reopen the AQE reuse-timing flap)
    val corners = tris
      .select(explode(array(col("u"), col("v"), col("w"))).as("x"))
      .groupBy(col("x")).agg(count(lit(1)).as("tri_cnt"))
    deg.join(corners, Seq("x"), "left")
      .select(col("x").as("vec_id"), col("deg"),
        coalesce(col("tri_cnt"), lit(0L)).as("tri_cnt"),
        when(col("deg") < 2, lit(0L))
          .otherwise(expr(s"2 * coalesce(tri_cnt, 0) * ${RankOne}" +
            " div (deg * (deg - 1))")).as("lcc_micro"))
  }

  /** DuckDB oracle for [[triangles]]: the identical degree-ordered
    * compact-forward enumeration over an `edgesSql` subquery yielding
    * (src, dst). Every multiply-referenced CTE is MATERIALIZED:
    * DuckDB inlines plain CTEs per reference, so without it the kNN
    * edge replay re-executes once per downstream mention (≈12× through
    * the wedge join's three `oriented` references) — observed as a
    * 72 GB temp spill + disk exhaustion at sf1 where the materialized
    * form runs in seconds.
    */
  def trianglesDuckdbSql(edgesSql: String): String =
    s"""WITH raw AS MATERIALIZED ($edgesSql),
          und AS MATERIALIZED (
            SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            FROM raw WHERE src <> dst
          ),
          deg AS MATERIALIZED (
            SELECT x, count(*) AS deg FROM (
              SELECT a AS x FROM und UNION ALL SELECT b AS x FROM und
            ) GROUP BY x
          ),
          oriented AS MATERIALIZED (
            SELECT CASE WHEN da.deg * 4294967296 + u.a
                           < db.deg * 4294967296 + u.b
                        THEN u.a ELSE u.b END AS u,
                   CASE WHEN da.deg * 4294967296 + u.a
                           < db.deg * 4294967296 + u.b
                        THEN u.b ELSE u.a END AS v
            FROM und u
            JOIN deg da ON da.x = u.a
            JOIN deg db ON db.x = u.b
          ),
          tris AS MATERIALIZED (
            SELECT e1.u, e1.v, e2.v AS w
            FROM oriented e1
            JOIN oriented e2 ON e2.u = e1.v
            JOIN oriented e3 ON e3.u = e1.u AND e3.v = e2.v
          ),
          corners AS (
            SELECT x, cast(count(*) as bigint) AS tri_cnt FROM (
              SELECT u AS x FROM tris
              UNION ALL SELECT v AS x FROM tris
              UNION ALL SELECT w AS x FROM tris
            ) GROUP BY x
          )
        SELECT d.x AS vec_id, d.deg,
               cast(coalesce(c.tri_cnt, 0) as bigint) AS tri_cnt,
               cast(CASE WHEN d.deg < 2 THEN 0
                         ELSE (2 * coalesce(c.tri_cnt, 0) * $RankOne)
                              // (d.deg * (d.deg - 1)) END as bigint)
                 AS lcc_micro
        FROM deg d LEFT JOIN corners c ON c.x = d.x"""

  /** Bounded-round k-core peel over the UNDIRECTED closure of `edges`
    * — the dense-substructure extractor next to [[triangles]]' local
    * cohesion: a node survives round i iff its degree within the
    * still-alive subgraph is ≥ k. `rounds` is a fixed small constant
    * (the caller's dial, like [[pageRank]]'s iters): after R rounds the
    * alive set is the R-step approximation of the true k-core, exact
    * whenever peeling converges within R (it converges fast on
    * similarity graphs, whose peel cascades are shallow; the
    * full-fixpoint loop is the same code with a convergence check a
    * deployment adds). Output per ORIGINAL node: in_core flag and the
    * node's degree within the surviving subgraph (0 once peeled or for
    * a non-member) — all exact integers, so engine-exact and the
    * oracle unrolls the identical rounds as CTEs.
    *
    * Scale shape: the undirected closure is cut once; each round is
    * two semi-joins of the edge frame against the alive set (shuffle ∝
    * edges) and one count per node — the peel never materializes
    * anything beyond the |V|-row alive/degree frames, which are cut
    * per round to bound lineage, exactly the pageRank discipline.
    */
  def kCore(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1 && rounds <= 20,
      s"kCore: need k >= 1 and rounds in [1, 20], got k=$k rounds=$rounds")
    val und = graft.config.Checkpoints.cut(edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct())
    val nodes = graft.config.Checkpoints.cut(
      und.select(col("a").as("x"))
        .unionAll(und.select(col("b").as("x")))
        .distinct())
    var alive = nodes
    var aliveDeg: DataFrame = null
    for (_ <- 1 to rounds) {
      val live = und
        .join(alive.select(col("x").as("a")), Seq("a"), "left_semi")
        .join(alive.select(col("x").as("b")), Seq("b"), "left_semi")
      aliveDeg = graft.config.Checkpoints.cut(
        live.select(col("a").as("x"))
          .unionAll(live.select(col("b").as("x")))
          .groupBy(col("x")).agg(count(lit(1)).as("deg")))
      alive = aliveDeg.filter(col("deg") >= k).select(col("x"))
    }
    // survivors' degree = their count in the LAST round's subgraph,
    // re-thresholded (a node can fall below k in the final round and
    // be out even though it was counted); peeled nodes report 0
    val fin = aliveDeg.filter(col("deg") >= k)
    nodes.join(fin, Seq("x"), "left")
      .select(col("x").as("vec_id"),
        when(col("deg").isNotNull, lit(1)).otherwise(lit(0)).as("in_core"),
        coalesce(col("deg"), lit(0L)).as("core_deg"))
  }

  /** DuckDB oracle for [[kCore]]: the identical unrolled peel. Every
    * multiply-referenced CTE is MATERIALIZED — the peel references
    * `und` and each round's alive set several times per round, and
    * DuckDB inlines plain CTEs per reference (the trianglesDuckdbSql
    * 72 GB-spill lesson; here the re-execution would compound PER
    * ROUND).
    */
  def kCoreDuckdbSql(edgesSql: String, k: Int, rounds: Int): String = {
    val steps = (1 to rounds).map { i =>
      s"""deg$i AS MATERIALIZED (
            SELECT x, count(*) AS deg FROM (
              SELECT e.a AS x FROM und e
              JOIN alive${i - 1} p ON p.x = e.a
              JOIN alive${i - 1} q ON q.x = e.b
              UNION ALL
              SELECT e.b AS x FROM und e
              JOIN alive${i - 1} p ON p.x = e.a
              JOIN alive${i - 1} q ON q.x = e.b
            ) GROUP BY x
          ), alive$i AS MATERIALIZED (
            SELECT x FROM deg$i WHERE deg >= $k)"""
    }.mkString(", ")
    s"""WITH raw AS MATERIALIZED ($edgesSql),
          und AS MATERIALIZED (
            SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            FROM raw WHERE src <> dst
          ),
          nodes AS MATERIALIZED (
            SELECT DISTINCT x FROM (
              SELECT a AS x FROM und UNION ALL SELECT b AS x FROM und
            )
          ),
          alive0 AS MATERIALIZED (SELECT x FROM nodes),
          $steps
        SELECT n.x AS vec_id,
               CASE WHEN f.deg IS NOT NULL THEN 1 ELSE 0 END AS in_core,
               cast(coalesce(f.deg, 0) as bigint) AS core_deg
        FROM nodes n LEFT JOIN (
          SELECT x, deg FROM deg$rounds WHERE deg >= $k
        ) f ON f.x = n.x"""
  }

  /** DuckDB oracle for [[pageRank]]: the identical integer iteration,
    * unrolled as one CTE per superstep over an `edgesSql` subquery that
    * yields (src, dst) and a `nodesSql` subquery that yields (vec_id).
    */
  def pageRankDuckdbSql(nodesSql: String, edgesSql: String,
                        iters: Int): String = {
    val steps = (1 to iters).map { i =>
      s"""r$i AS (
            SELECT n.vec_id,
                   cast($Teleport + (coalesce(s.cin, 0) * $DampNum) // $DampDen
                        as bigint) AS r
            FROM nodes n LEFT JOIN (
              -- sum(bigint) is HUGEINT in DuckDB; pin the sketch's
              -- integer lane back to bigint so dtypes match Spark
              SELECT g.dst, cast(sum(p.r // g.outdeg) as bigint) AS cin
              FROM graph g JOIN r${i - 1} p ON p.vec_id = g.src
              GROUP BY g.dst
            ) s ON s.dst = n.vec_id
          )"""
    }.mkString(", ")
    s"""WITH nodes AS ($nodesSql),
          edges AS ($edgesSql),
          graph AS (
            SELECT e.src, e.dst, d.outdeg
            FROM edges e JOIN (
              SELECT src, count(*) AS outdeg FROM edges GROUP BY src
            ) d ON d.src = e.src
          ),
          r0 AS (SELECT vec_id, cast($RankOne as bigint) AS r FROM nodes),
          $steps
        SELECT vec_id, r AS rank_micro FROM r$iters"""
  }
}
