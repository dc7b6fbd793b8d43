package graft

import org.apache.spark.sql.functions._

import graft.analytics.{Graph, Sketch}
import graft.qa.Qa

class SketchGraphSpec extends SparkSpec {
  import spark.implicits._

  test("kmvSketch: exact below k, estimate within KMV error above k, " +
    "and the two ranking paths agree") {
    // group "small" has 10 distinct values (< k) → exact count reported;
    // group "big" has 5000 distinct values (>> k) → estimate within the
    // sketch's standard error (~1/sqrt(k-1) ≈ 12.6% at k=64; assert 4σ)
    val rows = (1 to 10).map(i => ("small", s"s$i")) ++
      (1 to 5000).map(i => ("big", s"value-$i")) ++
      (1 to 10).map(i => ("small", s"s$i")) // duplicates change nothing
    val df = rows.toDF("source", "text")
    val out = Sketch.kmvSketch(df, "source", "text", k = 64).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(out("small").getAs[Long]("n_hashes") == 10)
    assert(out("small").getAs[Int]("n_kept") == 10)
    assert(out("small").getAs[Double]("est_distinct") == 10.0)
    assert(out("big").getAs[Long]("n_hashes") == 5000)
    assert(out("big").getAs[Int]("n_kept") == 64)
    val est = out("big").getAs[Double]("est_distinct")
    assert(math.abs(est - 5000.0) / 5000.0 < 0.5, s"estimate $est")
    // kth_min really is the 64th smallest fp62 hash (independent recompute)
    val kth = df.filter(col("source") === "big")
      .select(expr(graft.dedup.MinHashSpec
        .fingerprint62Expr(spark, "text")).as("h"))
      .distinct().orderBy("h").limit(64).collect().map(_.getLong(0)).max
    assert(out("big").getAs[Long]("kth_min") == kth)
    // estimate formula replayed exactly
    assert(est == Sketch.estNumerator(64) / kth.toDouble)
  }

  test("kmvSketch: window fallback path is value-identical to topk_by") {
    assert(spark.catalog.functionExists("topk_by")) // native path live
    val df = (1 to 500).map(i => (s"g${i % 3}", s"v$i"))
      .toDF("source", "text")
    val native = Sketch.kmvSketch(df, "source", "text", k = 16)
      .orderBy("source").collect().map(_.toSeq).toSeq
    val fallback = Sketch.kmvSketchFallback(df, "source", "text", k = 16)
      .orderBy("source").collect().map(_.toSeq).toSeq
    assert(native == fallback)
  }

  test("kmvMerge: merged-from-parts equals the direct corpus sketch") {
    val df = (1 to 3000).map(i => (s"src${i % 5}", s"doc-$i"))
      .toDF("source", "text")
    val r = Sketch.kmvMerge(df, "source", "text", k = 32).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Int]("merge_agrees") == 1)
    assert(r(0).getAs[Double]("est_merged") ==
      r(0).getAs[Double]("est_direct"))
    // and the value matches the one-pass sketch run independently
    val direct = Sketch.kmvSketch(
      df.withColumn("source", lit("all")), "source", "text", k = 32)
      .collect()(0).getAs[Double]("est_distinct")
    assert(r(0).getAs[Double]("est_direct") == direct)
  }

  test("kmvJaccard: estimate tracks exact overlap; disjoint pairs are 0, " +
    "identical sets are 1") {
    // a and b share exactly half their values; c is disjoint from both;
    // d is identical to c
    val shared = (1 to 200).map(i => s"shared-$i")
    val rows =
      shared.map(("a", _)) ++ (1 to 200).map(i => ("a", s"only-a-$i")) ++
      shared.map(("b", _)) ++ (1 to 200).map(i => ("b", s"only-b-$i")) ++
      (1 to 150).map(i => ("c", s"c-$i")) ++
      (1 to 150).map(i => ("d", s"c-$i"))
    val out = Sketch.kmvJaccard(rows.toDF("source", "text"),
      "source", "text", k = 64).collect()
      .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")) -> r)
      .toMap
    assert(out.size == 6) // 4 choose 2
    val ab = out(("a", "b"))
    assert(ab.getAs[Double]("j_exact") == 200.0 / 600.0)
    // estimate within ~4σ of truth at k=64 (σ ≈ sqrt(J(1-J)/k) ≈ 0.06)
    assert(math.abs(ab.getAs[Double]("j_est") - 1.0 / 3.0) < 0.25)
    assert(ab.getAs[Int]("k_used") == 64)
    val ac = out(("a", "c")); val cd = out(("c", "d"))
    assert(ac.getAs[Double]("j_est") == 0.0 &&
      ac.getAs[Double]("j_exact") == 0.0)
    assert(cd.getAs[Double]("j_est") == 1.0 &&
      cd.getAs[Double]("j_exact") == 1.0)
    // j_est is exactly n_common / k_used
    assert(ab.getAs[Double]("j_est") ==
      ab.getAs[Long]("n_common").toDouble / ab.getAs[Int]("k_used"))
  }

  test("kmvSketch: nulls are excluded, not a group of their own") {
    val df = Seq(("a", "x"), ("a", null), ("b", null))
      .toDF("source", "text")
    val out = Sketch.kmvSketch(df, "source", "text", k = 4).collect()
    assert(out.map(_.getAs[String]("source")).toSet == Set("a"))
    assert(out(0).getAs[Long]("n_hashes") == 1)
  }

  test("pageRank: hand-computed integer iteration on a 3-node cycle " +
    "plus a dangler") {
    // a -> b -> c -> a, d dangling (no out-edges, no in-edges)
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("vec_id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val r = Graph.pageRank(nodes, edges, iters = 3).collect()
      .map(x => x.getAs[Long]("vec_id") -> x.getAs[Long]("rank_micro")).toMap
    // cycle: every node has outdeg 1, receives exactly one full rank.
    // r1 = 150000 + 85*1000000/100 = 1000000 (fixpoint of the cycle)
    assert(r(1L) == 1000000L && r(2L) == 1000000L && r(3L) == 1000000L)
    // dangler: receives nothing, holds the teleport floor every round
    assert(r(4L) == 150000L)
  }

  test("pageRank: out-degree division and damping are floor-exact") {
    // hub 1 -> {2, 3}; 2 -> 1; 3 has no out-edges (dangling sink)
    val nodes = Seq(1L, 2L, 3L).toDF("vec_id")
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L)).toDF("src", "dst")
    val r1 = Graph.pageRank(nodes, edges, iters = 1).collect()
      .map(x => x.getAs[Long]("vec_id") -> x.getAs[Long]("rank_micro")).toMap
    // node 1: gets all of 2's rank: 150000 + 85*1000000/100 = 1000000
    // node 2: gets 1000000 div 2 = 500000: 150000 + 85*500000/100 = 575000
    assert(r1(1L) == 1000000L)
    assert(r1(2L) == 575000L && r1(3L) == 575000L)
    val r2 = Graph.pageRank(nodes, edges, iters = 2).collect()
      .map(x => x.getAs[Long]("vec_id") -> x.getAs[Long]("rank_micro")).toMap
    // round 2: node1 ← r(2)=575000 → 150000 + 488750 = 638750
    //          node2,3 ← r(1) div 2 = 500000 → 575000
    assert(r2(1L) == 638750L)
    assert(r2(2L) == 575000L && r2(3L) == 575000L)
  }

  test("pageRank matches its unrolled DuckDB-shape SQL on a random graph") {
    // engine-internal replay: run the SAME integer iteration via Spark
    // SQL over the unrolled formulation to pin the div/damping lanes
    val n = 50
    val rnd = new scala.util.Random(7)
    val edgeSeq = (0 until 120).map(_ => (rnd.nextInt(n).toLong,
      rnd.nextInt(n).toLong)).distinct.filter(e => e._1 != e._2)
    val nodes = (0L until n.toLong).toDF("vec_id")
    val edges = edgeSeq.toDF("src", "dst")
    val fast = Graph.pageRank(nodes, edges, iters = 2).collect()
      .map(x => x.getAs[Long]("vec_id") -> x.getAs[Long]("rank_micro")).toMap
    // naive reference in Scala
    val deg = edgeSeq.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = (0L until n.toLong).map(_ -> 1000000L).toMap
    for (_ <- 1 to 2) {
      val cin = edgeSeq.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) / deg(s) }.sum).toMap
      r = (0L until n.toLong)
        .map(v => v -> (150000L + cin.getOrElse(v, 0L) * 85L / 100L)).toMap
    }
    assert(fast == r)
  }

  test("mmrRerank: greedy diversity — picks the relevant-but-redundant " +
    "candidate last") {
    import graft.similarity.Similarity
    // probe 0 at e1; candidates: 1 and 2 near-identical (both very
    // close to the probe), 3 orthogonal-ish but still relevant. Plain
    // top-3 ranks (1, 2, 3); MMR must pick 1, then PENALIZE 2 for its
    // redundancy with 1 and pick 3 second.
    def v(parts: (Int, Double)*): Seq[Float] = {
      val a = Array.fill(64)(0.001f)
      parts.foreach { case (i, x) => a(i) = x.toFloat }
      a.toSeq
    }
    // geometry: c1/c2 are near-duplicates (sim ≈ 1.0, cos ≈ 0.74 to the
    // probe); c3 is moderately diverse (sim to c1 ≈ 0.53) at cos ≈ 0.71.
    // Plain ranking: (c1, c2, c3). MMR step 2: score(c2) ≈
    // 0.7·0.740 − 0.3·1.0 ≈ 0.218 < score(c3) ≈ 0.7·0.707 − 0.3·0.53
    // ≈ 0.337 → c3 second. nBits=1 keeps all four in colliding buckets.
    val probe = Seq((0L, v(0 -> 1.0), 0))
    val cands = Seq(
      (1L, v(0 -> 1.0, 1 -> 0.90), 0),
      (2L, v(0 -> 1.0, 1 -> 0.91), 0),   // near-duplicate of 1
      (3L, v(0 -> 1.0, 2 -> 1.00), 0))   // diverse, slightly less relevant
    val df = (probe ++ cands).toDF("vec_id", "embedding", "label")
    def run() = Similarity.mmrRerank(
      df.filter($"vec_id" === 0L), df.filter($"vec_id" =!= 0L),
      k = 3, shortlist = 8, nBits = 1)
    val out = run().collect()
      .map(r => r.getAs[Int]("mmr_rank") -> r.getAs[Long]("cand_id")).toMap
    assert(out.size == 3, s"expected 3 MMR picks, got $out")
    assert(out(1) == 1L) // rank 1 = pure relevance (tie-broken by id)
    assert(out(2) == 3L, s"MMR rank 2 must be the diverse candidate, got $out")
    assert(out(3) == 2L)
    // scores are the published selection-time values: rank1 = cosine
    val rows = run().collect()
    val r1 = rows.find(_.getAs[Int]("mmr_rank") == 1).get
    assert(r1.getAs[Double]("mmr_score") == r1.getAs[Double]("cosine"))
    val r2 = rows.find(_.getAs[Int]("mmr_rank") == 2).get
    assert(r2.getAs[Double]("mmr_score") < r2.getAs[Double]("cosine"))
  }

  test("triangles: hand graph — closure collapse, counts, lcc, pendant") {
    // K4 on {1,2,3,4} minus edge (3,4), plus pendant 5—1; noise rows
    // exercise the undirected closure: reciprocal (2,1), duplicate
    // (1,3), self-loop (3,3). Triangles: {1,2,3} and {1,2,4}.
    val edges = Seq(
      (1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (1L, 4L), (2L, 3L),
      (2L, 4L), (1L, 5L), (3L, 3L)).toDF("src", "dst")
    val out = Graph.triangles(edges).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("deg"), r.getAs[Long]("tri_cnt"),
          r.getAs[Long]("lcc_micro")))).toMap
    assert(out(1L) == ((4L, 2L, 2L * 2 * 1000000L / (4 * 3))))
    assert(out(2L) == ((3L, 2L, 2L * 2 * 1000000L / (3 * 2))))
    assert(out(3L) == ((2L, 1L, 1000000L)))
    assert(out(4L) == ((2L, 1L, 1000000L)))
    assert(out(5L) == ((1L, 0L, 0L))) // deg < 2 → lcc pinned 0
    assert(out.size == 5)
  }

  test("triangles matches a brute-force reference on a random graph") {
    val n = 40
    val rnd = new scala.util.Random(11)
    val edgeSeq = (0 until 150).map(_ =>
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).distinct
    val out = Graph.triangles(edgeSeq.toDF("src", "dst")).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("deg"), r.getAs[Long]("tri_cnt")))).toMap
    // reference: undirected adjacency sets, count closed neighbour pairs
    val und = edgeSeq.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    val adj = und.toSeq.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    adj.foreach { case (v, nb) =>
      val tri = nb.toSeq.combinations(2)
        .count(p => und.contains((math.min(p(0), p(1)),
          math.max(p(0), p(1)))))
      assert(out(v)._1 == nb.size.toLong, s"deg of $v")
      assert(out(v)._2 == tri.toLong, s"tri of $v")
    }
    assert(out.keySet == adj.keySet)
  }

  test("kCore: peel cascades round by round; survivors report their " +
    "core degree") {
    // triangle {1,2,3} + tail 3—4—5. k=2: round 1 peels 5 (deg 1);
    // round 2 peels 4, whose degree drops to 1 once 5 is gone; round 3
    // is the fixpoint {1,2,3} with core degrees 2,2,2.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val out = Graph.kCore(edges, k = 2, rounds = 3).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Int]("in_core"), r.getAs[Long]("core_deg")))).toMap
    assert(out(1L) == ((1, 2L)) && out(2L) == ((1, 2L))
      && out(3L) == ((1, 2L)))
    assert(out(4L) == ((0, 0L)) && out(5L) == ((0, 0L)))
    assert(out.size == 5)
    // one round only: 4 still counts as alive (deg 2 in the full graph)
    val r1 = Graph.kCore(edges, k = 2, rounds = 1).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("in_core")).toMap
    assert(r1(4L) == 1 && r1(5L) == 0)
    // k above the max degree empties the core but keeps every node row
    val none = Graph.kCore(edges, k = 5, rounds = 2).collect()
    assert(none.length == 5 && none.forall(_.getAs[Int]("in_core") == 0))
  }

  test("benford: digit shares and deviations are exact integer micro-units") {
    // 30 values leading with 1, 10 with 2, 5 with 9 (and a null + a zero
    // + a negative that must all be excluded)
    val vals = Seq.fill(30)(123.45) ++ Seq.fill(10)(29.99) ++
      Seq.fill(5)(0.09) ++ Seq(0.0, -5.0)
    val df = (vals.map(Option(_)) :+ None).toDF("l_extendedprice")
    val out = Qa.benford(df, "l_extendedprice").orderBy("digit").collect()
    assert(out.length == 9)
    val byDigit = out.map(r => r.getAs[Int]("digit") -> r).toMap
    assert(byDigit(1).getAs[Long]("n") == 30)
    assert(byDigit(2).getAs[Long]("n") == 10)
    assert(byDigit(9).getAs[Long]("n") == 5) // 0.09 → 9 cents → digit 9
    assert(byDigit(3).getAs[Long]("n") == 0)
    // shares: total qualifying = 45
    assert(byDigit(1).getAs[Long]("obs_micro") == 30L * 1000000L / 45L)
    assert(byDigit(1).getAs[Long]("exp_micro") == Qa.benfordExpMicro(1))
    assert(byDigit(1).getAs[Long]("dev_micro") ==
      30L * 1000000L / 45L - Qa.benfordExpMicro(1))
    // expected literals are the classic Benford table (301030 µ for 1)
    assert(Qa.benfordExpMicro(1) == 301029L)
    assert((1 to 9).map(Qa.benfordExpMicro).sum > 999990L) // sums to ~1
  }
}
