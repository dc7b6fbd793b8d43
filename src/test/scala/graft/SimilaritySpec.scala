package graft

import org.apache.spark.sql.functions._

import graft.similarity.Similarity

class SimilaritySpec extends SparkSpec {

  private lazy val emb = Tables(spark, sfDir, "embeddings")

  test("cosineTopK returns k ranked neighbors per probe, self excluded") {
    val out = Similarity.cosineTopK(emb, Seq(0L, 1L, 2L), k = 5).collect()
    assert(out.length == 15)
    out.foreach { r =>
      assert(r.getAs[Long]("probe_id") != r.getAs[Long]("cand_id"))
      val c = r.getAs[Double]("cosine")
      assert(c >= -1.0001 && c <= 1.0001)
    }
    // ranks are 1..5 per probe and ordered by descending cosine
    val byProbe = out.groupBy(_.getAs[Long]("probe_id"))
    byProbe.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Int]("rnk"))
      assert(sorted.map(_.getAs[Int]("rnk")).toSeq == (1 to 5))
      val cosines = sorted.map(_.getAs[Double]("cosine")).toSeq
      assert(cosines == cosines.sorted.reverse)
    }
  }

  test("topk_by aggregate equals the window ranking across partial merges") {
    import org.apache.spark.sql.expressions.Window
    // 8 partitions force map-side partial heaps + serialize/merge; some
    // NULL scores must be skipped
    val df = spark.range(1000).repartition(8).selectExpr(
      "id % 7 as g",
      "CASE WHEN id % 97 = 0 THEN NULL ELSE cast(pmod(hash(id), 100) as double) END as score",
      "id as tie")
    val viaAgg = df.groupBy("g")
      .agg(expr("topk_by(score, tie, struct(tie, score), 5)").as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("g"), col("e.payload.tie").as("tie"),
        col("e.payload.score").as("score"), (col("pos") + 1).cast("long").as("rnk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("tie"))
    val viaWin = df.filter(col("score").isNotNull)
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 5)
      .select(col("g"), col("tie"), col("score"), col("rnk").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(viaAgg == viaWin)
    assert(viaAgg.nonEmpty)
  }

  test("topk_by edge cases: k exceeding group size, duplicate scores, all-null") {
    val df = spark.range(6).selectExpr("id % 2 as g",
      "CASE WHEN id = 5 THEN NULL ELSE cast(1.0 as double) END as score", // duplicate scores + a null
      "id as tie")
    val agg = df.groupBy("g")
      .agg(expr("topk_by(score, tie, struct(tie), 10)").as("top"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(_.getStruct(2).getLong(0))).toMap
    // k=10 > group size: whole group returned (minus the null-score row),
    // duplicate scores ordered by tie ascending
    assert(agg(0L) == Seq(0L, 2L, 4L))
    assert(agg(1L) == Seq(1L, 3L)) // id 5 had NULL score — skipped
    // a group with ONLY null scores yields an empty array, not a crash
    val allNull = spark.range(3)
      .selectExpr("0 as g", "cast(NULL as double) as score", "id as tie")
      .groupBy("g").agg(expr("topk_by(score, tie, struct(tie), 3)").as("top"))
      .collect().head.getSeq[Any](1)
    assert(allNull.isEmpty)
  }

  test("cosineTopK (topk_by path) equals a plain single-window ranking") {
    val viaAgg = Similarity.cosineTopK(emb, Seq(0L, 1L, 2L), k = 5)
      .collect().map(_.toSeq).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("probe_id").orderBy(col("cosine").desc, col("cand_id"))
    val probes = emb.filter(col("vec_id").isInCollection(Seq(0L, 1L, 2L)))
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
    val scored = emb.select(col("vec_id").as("cand_id"), col("embedding").as("cand_vec"))
      .join(broadcast(probes), col("probe_id") =!= col("cand_id"))
      .withColumn("cosine", round(expr("cosine_sim(probe_vec, cand_vec)"), 4))
    val viaWin = scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("probe_id"), col("cand_id"), col("cosine"), col("rnk"))
      .collect().map(_.toSeq).toSet
    assert(viaAgg == viaWin)
  }

  test("lshBuckets is deterministic and bounded, one row per table") {
    def run() = Similarity.lshBuckets(emb, nBits = 6, nTables = 4)
      .select("vec_id", "table", "bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val b1 = run(); val b2 = run()
    assert(b1 == b2)
    assert(b1.values.forall(b => b >= 0 && b < 64))
    assert(b1.keys.map(_._2).toSet == Set(0, 1, 2, 3))
  }

  test("native lsh_buckets equals the composed-expression fallback") {
    import org.apache.spark.sql.functions.{expr, typedLit, aggregate, zip_with, lit, when, array, col}
    val nBits = 6; val nTables = 4; val dim = 64
    val composed = array((0 until nTables).map { t =>
      (0 until nBits).map { j =>
        val plane = Array.tabulate(dim)(d =>
          Similarity.planeSign(t * nBits + j, d))
        val proj = aggregate(
          zip_with(col("embedding"), typedLit(plane), (x, r) => x.cast("double") * r),
          lit(0.0), (acc, v) => acc + v)
        when(proj >= 0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*)
    val both = emb.select(
      expr(s"lsh_buckets(embedding, $nBits, $nTables, $dim)").as("native"),
      composed.as("fallback"))
    assert(both.filter(expr("native != fallback")).count() == 0)
  }

  test("annTopK achieves non-trivial recall against brute force") {
    val probes = (0L until 10L)
    val exact = Similarity.cosineTopK(emb, probes, k = 5).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("cand_id"))).toSet
    val ann = Similarity.annTopK(emb, probes, k = 5, nBits = 6, nTables = 8)
      .collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("cand_id"))).toSet
    val recall = exact.intersect(ann).size.toDouble / exact.size
    info(f"ANN recall@5 = $recall%.2f (${ann.size} returned)")
    // embeddings are near-random (best neighbors ~cos 0.35), so LSH recall
    // is structurally modest; 8 tables x 6 bits lands ~0.3 here.
    assert(recall > 0.15, f"recall $recall too low")
  }

  test("knnJoin with a filtered-subset probe table equals annTopK exactly") {
    // same planes, same buckets: lifting the probe side from a driver id
    // list to a DataFrame must not change a single (probe, cand, rnk) row
    val ids = (0L until 10L)
    val viaList = Similarity.annTopK(emb, ids, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val viaJoin = Similarity.knnJoin(
      emb.filter(col("vec_id").isInCollection(ids)), emb, k = 5,
      excludeSelf = true).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(viaJoin == viaList)
    assert(viaJoin.nonEmpty)
  }

  test("knnJoin: planted twin ranks first at cosine 1.0; graph form has no self pairs") {
    val corpus = emb.filter(col("vec_id") < 100)
    // probes are exact copies of corpus vectors under fresh ids: identical
    // vectors share every bucket, so the twin is always a candidate and
    // (max pairwise cosine of distinct vectors ~0.51) always rank 1
    val probes = corpus.filter(col("vec_id") < 3)
      .withColumn("vec_id", col("vec_id") + 1000000L)
    val out = Similarity.knnJoin(probes, corpus, k = 3).collect()
    val byProbe = out.groupBy(_.getAs[Long]("probe_id"))
    assert(byProbe.keySet == Set(1000000L, 1000001L, 1000002L))
    byProbe.foreach { case (pid, rs) =>
      assert(rs.length <= 3)
      val sorted = rs.sortBy(_.getAs[Int]("rnk"))
      assert(sorted.map(_.getAs[Int]("rnk")).toSeq == (1 to rs.length))
      val cosines = sorted.map(_.getAs[Double]("cosine")).toSeq
      assert(cosines == cosines.sorted.reverse)
      assert(sorted.head.getAs[Long]("cand_id") == pid - 1000000L)
      assert(sorted.head.getAs[Double]("cosine") == 1.0)
    }
    val graph = Similarity.knnJoin(corpus, corpus, k = 2, excludeSelf = true)
      .collect()
    assert(graph.nonEmpty)
    graph.foreach { r =>
      assert(r.getAs[Long]("probe_id") != r.getAs[Long]("cand_id"))
    }
  }

  test("rangeSearch: equals knnJoin-with-large-k filtered at the radius; twin included") {
    val corpus = emb.filter(col("vec_id") >= 100 && col("vec_id") < 300)
    val probes = emb.filter(col("vec_id") < 3)
      .withColumn("vec_id", col("vec_id") + 1000000L)
      .unionByName(corpus.filter(col("vec_id") === 100L)
        .withColumn("vec_id", lit(2000000L))) // planted twin of corpus 100
    val t = 0.3
    val range = Similarity.rangeSearch(probes, corpus, threshold = t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // the radius form IS the rank form with the rank bound removed: a k
    // larger than any candidate set makes them the same set post-filter
    val viaKnn = Similarity.knnJoin(probes, corpus, k = 100000)
      .filter(col("cosine") >= t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(range == viaKnn)
    // the planted twin shares every bucket and sits inside any radius
    assert(range.contains((2000000L, 100L, 1.0)))
    // the radius actually cuts something (the filter is not vacuous)
    val all = Similarity.rangeSearch(probes, corpus, threshold = -1.0).collect()
    assert(all.length > range.size)
  }

  test("recallEval: dense per-probe output, hits = |ann ∩ brute|, twin always hits") {
    val corpus = emb.filter(col("vec_id") >= 100 && col("vec_id") < 300)
    val probes = emb.filter(col("vec_id") < 4)
      .withColumn("vec_id", col("vec_id") + 1000000L)
      .unionByName(corpus.filter(col("vec_id") === 100L)
        .withColumn("vec_id", lit(2000000L)))
    val k = 3
    val out = Similarity.recallEval(probes, corpus, k).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toList
    // dense: one row per probe, hit or not
    assert(out.map(_._1).toSet ==
      Set(1000000L, 1000001L, 1000002L, 1000003L, 2000000L))
    // recall is n_hits/k rounded, bounded
    out.foreach { case (_, h, r) =>
      assert(h >= 0 && h <= k)
      assert(math.abs(r - math.round(h.toDouble / k * 10000) / 10000.0) < 1e-12)
    }
    // pin the intersection semantics against an independent composition
    val ann = Similarity.knnJoin(probes, corpus, k)
      .select(col("probe_id"), col("cand_id"))
    val brute = Similarity.knnJoin(probes, corpus, k, nBits = 0, nTables = 1)
    // (nBits=0 → one bucket → candidates = all pairs = brute force)
    val expect = brute.select(col("probe_id"), col("cand_id"))
      .join(ann, Seq("probe_id", "cand_id"), "left_semi")
      .groupBy("probe_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    out.foreach { case (pid, h, _) => assert(h == expect.getOrElse(pid, 0)) }
    // the planted twin is rank 1 in BOTH paths, so its probe has ≥1 hit
    assert(out.find(_._1 == 2000000L).get._2 >= 1)
  }

  test("ivf: centroids deterministic, assignments partition the corpus") {
    val c1 = Similarity.ivfCentroids(emb, k = 8, iters = 2)
    val c2 = Similarity.ivfCentroids(emb, k = 8, iters = 2)
    assert(c1.length == 8 && c1.head.length == 64)
    assert(c1.zip(c2).forall { case (a, b) => a.sameElements(b) })
  }

  test("ivfTopK recall beats or matches the nprobe/k candidate fraction") {
    val probes = (0L until 10L)
    val exact = Similarity.cosineTopK(emb, probes, k = 5).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("cand_id"))).toSet
    val ivf = Similarity.ivfTopK(emb, probes, topK = 5, k = 16, nprobe = 4)
      .collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("cand_id"))).toSet
    val recall = exact.intersect(ivf).size.toDouble / exact.size
    info(f"IVF recall@5 (nprobe=4/16) = $recall%.2f")
    // random embeddings: candidates are ~nprobe/k of the corpus; recall
    // should at least reach that fraction (clustered data does far better)
    assert(recall >= 0.15, f"recall $recall")
  }

  test("ivf centroids round-trip through parquet: persisted quantizer reproduces query-time training") {
    val trained = Similarity.ivfCentroids(emb, k = 8, iters = 3)
    val dir = tempDir("graft-ivf")
    val path = s"$dir/centroids"
    Similarity.saveCentroids(spark, trained, path)
    val loaded = Similarity.loadCentroids(spark, path)
    // bit-exact round trip, cluster order preserved
    assert(loaded.length == trained.length)
    assert(loaded.zip(trained).forall { case (a, b) => a.sameElements(b) })
    // and the search path with the persisted quantizer returns exactly the
    // results of the train-at-query-time path (the train-once/reuse contract)
    val probes = (0L until 5L)
    val fresh = Similarity.ivfTopK(emb, probes, topK = 5, k = 8, iters = 3)
      .collect().map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("cand_id"),
        r.getAs[Double]("cosine"))).toSet
    val reused = Similarity.ivfTopK(emb, probes, topK = 5, k = 8,
      centroids = Some(loaded))
      .collect().map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("cand_id"),
        r.getAs[Double]("cosine"))).toSet
    assert(fresh == reused)
  }

  test("pq codebooks round-trip through parquet bit-exact, [m][k][sub] shape") {
    val trained = Similarity.pqCodebooks(emb, m = 16, k = 16, iters = 5)
    val dir = tempDir("graft-pq")
    Similarity.savePqCodebooks(spark, trained, s"$dir/cb")
    val loaded = Similarity.loadPqCodebooks(spark, s"$dir/cb")
    assert(loaded.length == 16 && loaded.forall(_.length == 16)
      && loaded.forall(_.forall(_.length == 4)))
    assert(loaded.zip(trained).forall { case (ls, ts) =>
      ls.zip(ts).forall { case (l, t) => l.sameElements(t) } })
  }

  test("model bundle round-trips a whole trained set bit-exact in one table " +
    "(r15: equals the per-model save/load it replaced)") {
    val cents = Similarity.ivfCentroids(emb, k = 8, iters = 3)
    val cbs = Similarity.pqCodebooks(emb, m = 16, k = 16, iters = 5)
    val (mean, comps) = Similarity.pcaFit(emb, p = 4)
    val dir = tempDir("graft-bundle")
    Similarity.saveModelBundle(spark, Seq(
      "ivf" -> Array(cents),
      "pq" -> cbs,
      "pca" -> Array(mean +: comps)), s"$dir/models")
    val b = Similarity.loadModelBundle(spark, s"$dir/models")
    // IVF: 2-D model rides as cube slice 0, cluster order = positions
    assert(b("ivf")(0).zip(cents).forall { case (a, c) => a.sameElements(c) })
    // PQ: [m][k][sub] positions preserved — identical to the per-model
    // loader's layout contract
    assert(b("pq").length == 16 &&
      b("pq").zip(cbs).forall { case (ls, ts) =>
        ls.zip(ts).forall { case (l, t) => l.sameElements(t) } })
    // PCA: mean as row 0, components as rows 1..p (the OPQ layout)
    assert(b("pca")(0).head.sameElements(mean) &&
      b("pca")(0).tail.zip(comps).forall { case (a, c) => a.sameElements(c) })
  }

  test("trained IVFPQ recall: training + tuned dials beat the untrained index decisively") {
    // The train-your-index loop the two recall gates motivate, spec-bound:
    // the untrained (seeded) quantizers cap recall regardless of dials,
    // while TRAINED quantizers at the recall-sweep dials (m=16, nprobe=8)
    // clear them by a wide margin. All inputs deterministic (hash carve,
    // lowest-id bounded sample, sequential driver Lloyd) — the means are
    // exact round over round.
    val probes = emb.filter(col("vec_id") % 50 === 0)
    val corpus = emb.filter(col("vec_id") % 50 =!= 0)
    def meanRecall(df: org.apache.spark.sql.DataFrame): Double =
      df.agg(avg(col("recall"))).collect()(0).getDouble(0)
    val untrained = meanRecall(
      Similarity.recallIvfPq(probes, corpus, topK = 5))
    val cents = Similarity.ivfCentroids(corpus, k = 16, iters = 5)
    val cbs = Similarity.pqCodebooks(corpus, m = 16, k = 16, iters = 5)
    val trained = meanRecall(
      Similarity.recallIvfPq(probes, corpus, topK = 5, nprobe = 8, m = 16,
        centroids = Some(cents), codebooks = Some(cbs)))
    info(f"recall@5 untrained=$untrained%.2f trained=$trained%.2f")
    // sf0.001: untrained 0.20, trained 0.32 (sf0.01: 0.18 → 0.42)
    assert(trained >= untrained + 0.1,
      f"trained $trained%.2f vs untrained $untrained%.2f")
    assert(trained >= 0.3, f"trained recall $trained%.2f below bound")
    // the m dial at the SAME (kc=16, nprobe=8): m=32 (2-dim subspaces)
    // must clear m=16 decisively — the shipping dial the
    // emb_recall_ivfpq_trained_m32 gate surfaces (measured 0.56 vs
    // 0.32 sf0.001, 0.60 vs 0.42 sf0.01, 0.45 vs 0.295 sf0.1)
    val cbs32 = Similarity.pqCodebooks(corpus, m = 32, k = 16, iters = 5)
    val trained32 = meanRecall(
      Similarity.recallIvfPq(probes, corpus, topK = 5, nprobe = 8, m = 32,
        centroids = Some(cents), codebooks = Some(cbs32)))
    info(f"recall@5 trained m=16 $trained%.2f m=32 $trained32%.2f")
    assert(trained32 >= trained + 0.1,
      f"m=32 $trained32%.2f must beat m=16 $trained%.2f by >= 0.1")
    assert(trained32 >= 0.5, f"m=32 recall $trained32%.2f below bound")
    // the kc ∝ n COARSE dial at the same m=32/nprobe=8: kc=64 prunes
    // 4× harder (candidate fraction nprobe/kc falls 8/16 → 8/64),
    // which COSTS recall at fixed nprobe — the measurement the
    // emb_recall_ivfpq_trained_kc64 gate surfaces (0.40 vs 0.56 at
    // sf0.001). Bounded either way: the drop is pruning cost, not
    // index collapse, so it stays within 0.3 of kc=16 and above the
    // 0.3 floor; it must not BEAT kc=16 by more than noise (that would
    // mean the coarse quantizer, not PQ resolution, was the ceiling)
    val cents64 = Similarity.ivfCentroids(corpus, k = 64, iters = 5)
    val trainedKc64 = meanRecall(
      Similarity.recallIvfPq(probes, corpus, topK = 5, nprobe = 8, m = 32,
        centroids = Some(cents64), codebooks = Some(cbs32)))
    info(f"recall@5 trained m=32: kc=16 $trained32%.2f kc=64 $trainedKc64%.2f")
    assert(trainedKc64 >= 0.3,
      f"kc=64 recall $trainedKc64%.2f below the 0.3 floor")
    assert(trainedKc64 >= trained32 - 0.3 && trainedKc64 <= trained32 + 0.1,
      f"kc=64 $trainedKc64%.2f outside the documented band around kc=16 $trained32%.2f")
  }

  test("groupCentroids: elementwise means per group, long format") {
    import spark.implicits._
    val df = Seq(
      (0, Seq(1.0f, 3.0f)), (0, Seq(3.0f, 5.0f)), (1, Seq(10.0f, 0.0f)))
      .toDF("label", "embedding")
    val out = Similarity.groupCentroids(df).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getDouble(2), r.getInt(3))).toMap
    assert(out((0, 0)) == ((2.0, 2)) && out((0, 1)) == ((4.0, 2)))
    assert(out((1, 0)) == ((10.0, 1)) && out((1, 1)) == ((0.0, 1)))
  }

  test("kmeansAssign: equals a driver-side strict replay, planted centroid lands at l2 0") {
    val cents = Similarity.ivfCentroids(emb, k = 8, iters = 3)
    val out = Similarity.kmeansAssign(emb, centroids = Some(cents)).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Int]("cluster"), r.getAs[Double]("l2"))).toMap
    // driver replay: the same index-order double fold + first-min
    // tie-break + half-up rounding the operator contracts
    val vecs = emb.filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getAs[Long](0) -> r.getSeq[Float](1).toArray)
    assert(out.size == vecs.length) // one row per non-null vector
    vecs.foreach { case (id, v) =>
      var best = 0; var bestD = Double.MaxValue
      for (c <- cents.indices) {
        val n = math.min(v.length, cents(c).length)
        var d = 0.0; var i = 0
        while (i < n) {
          val t = v(i).toDouble - cents(c)(i); d += t * t; i += 1
        }
        if (d < bestD) { bestD = d; best = c } // strict < = first-min wins
      }
      val expL2 = math.floor(bestD * 1e4 + 0.5) / 1e4
      assert(out(id) == ((best, expL2)), s"vec $id")
    }
    // a vector that IS a centroid must land in that cluster at l2 0;
    // a null vector must be excluded, a short one accumulates min(len,dim)
    import spark.implicits._
    val planted = Seq(
      (1000L, Some(cents(3).map(_.toFloat).toSeq)),
      (1001L, None),
      (1002L, Some(Seq(cents(0)(0).toFloat)))) // short: only dim 0 counts
      .toDF("vec_id", "embedding")
    val p = Similarity.kmeansAssign(planted, centroids = Some(cents))
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Int]("cluster"), r.getAs[Double]("l2"))).toMap
    assert(p(1000L) == ((3, 0.0)))
    assert(!p.contains(1001L))
    assert(p.contains(1002L) && p(1002L)._2 >= 0.0)
  }

  test("l2Sq composed fallback matches the fused kernel on ragged vectors " +
    "(min(len,dim) accumulation, never NULL)") {
    // ADVICE r13: the old zip_with null-padded short vectors into NULL
    // distances, so a ragged corpus answered differently depending on
    // whether the fused centroid_dists expression was registered. Both
    // paths now contract min(|vec|, dim): slice both sides before the
    // fold. Pin value parity on short, exact-dim, and over-long vectors.
    import spark.implicits._
    val cent = Array(1.0, 2.0, 3.0, 4.0)
    val rows = Seq(
      (1L, Seq(1.0f)),                      // short: only dim 0 scores
      (2L, Seq(1.0f, 2.0f, 3.0f, 4.0f)),    // exact: full accumulation
      (3L, Seq(0.0f, 0.0f, 0.0f, 0.0f, 9f)),// long: extra dim ignored
      (4L, Seq.empty[Float]))               // empty: d = 0.0, not NULL
      .toDF("id", "v")
    val composed = rows.select(col("id"),
      Similarity.l2Sq("v", cent).as("d")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // fused kernel on the same rows (registered in this session)
    val fused = rows.selectExpr("id",
      "centroid_dists(v, array(array(1.0d, 2.0d, 3.0d, 4.0d)))[0] as d")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(composed == fused, s"composed=$composed fused=$fused")
    assert(composed(1L) == 0.0 && composed(4L) == 0.0)
    assert(composed(2L) == 0.0)
    assert(composed(3L) == 1.0 + 4.0 + 9.0 + 16.0)
  }

  test("pcaRotate: fused kernel equals a driver-side strict replay; " +
    "rotation is an isometry; ragged/null handled") {
    val (mean, comps) = Similarity.pcaFit(emb, p = 64)
    val out = Similarity.pcaRotate(emb, mean, comps).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Float](1).toArray).toMap
    val vecs = emb.filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getAs[Long](0) -> r.getSeq[Float](1).toArray)
    assert(out.size == vecs.length)
    // driver replay: per component, the strict index-order double fold
    // over min(len, dim), cast to float — the mat_rotate contract
    def replay(v: Array[Float]): Array[Float] =
      comps.map { w =>
        val n = math.min(v.length, w.length)
        var acc = 0.0; var d = 0
        while (d < n) { acc += (v(d).toDouble - mean(d)) * w(d); d += 1 }
        acc.toFloat
      }
    vecs.foreach { case (id, v) =>
      assert(out(id).sameElements(replay(v)), s"vec $id") }
    // isometry within float rounding: pairwise L2 preserved (the reason
    // ORIGINAL-space ground truth is fair for the rotated index)
    val ids = vecs.take(6).map(_._1)
    def l2(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) =>
        (x.toDouble - y) * (x.toDouble - y) }.sum
    val vm = vecs.toMap
    for (i <- ids; j <- ids if i < j) {
      val orig = l2(vm(i), vm(j))
      val rot = l2(out(i), out(j))
      assert(math.abs(orig - rot) <= 1e-3 * math.max(orig, 1.0),
        s"pair ($i,$j): $orig vs $rot")
    }
    // null excluded, short vector accumulates over its present dims
    import spark.implicits._
    val hostile = Seq(
      (1L, Some(Seq(1.0f, 2.0f))), (2L, None: Option[Seq[Float]]))
      .toDF("vec_id", "embedding")
    val h = Similarity.pcaRotate(hostile, mean, comps).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    assert(h.size == 1 && h(1L).sameElements(replay(Array(1.0f, 2.0f))))
    // the COMPOSED fallback path (mat_rotate not registered) must obey
    // the same min(len, dim) contract — this session has the extension,
    // so drive the fallback column directly; an unsliced zip_with would
    // null-pad a short vector into NULL coordinates here (ADVICE r14)
    val long = (1 to 80).map(_.toFloat) // longer than dim, truncates
    val hostile2 = Seq(
      (1L, Seq(1.0f, 2.0f)), (2L, vecs.head._2.toSeq), (3L, long))
      .toDF("vec_id", "embedding")
    val hc = hostile2.select(col("vec_id"),
        Similarity.pcaRotateComposedCol("embedding", mean, comps)
          .as("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    assert(hc(1L).sameElements(replay(Array(1.0f, 2.0f))),
      "composed fallback must accumulate a short vector over its dims")
    assert(hc(2L).sameElements(replay(vecs.head._2)))
    assert(hc(3L).sameElements(replay(long.toArray)),
      "composed fallback must truncate an over-long vector at dim")
  }

  test("pcaFit: deterministic orthonormal components, variance-ordered; " +
    "projection equals a driver-side strict replay") {
    val (m1, c1) = Similarity.pcaFit(emb, p = 4)
    val (m2, c2) = Similarity.pcaFit(emb, p = 4)
    assert(m1.sameElements(m2))
    assert(c1.zip(c2).forall { case (a, b) => a.sameElements(b) })
    // orthonormal within power-iteration tolerance
    for (i <- c1.indices; j <- c1.indices) {
      val dot = c1(i).zip(c1(j)).map { case (a, b) => a * b }.sum
      if (i == j) assert(math.abs(dot - 1.0) < 1e-9)
      else assert(math.abs(dot) < 1e-6, s"components $i,$j not orthogonal: $dot")
    }
    // sign convention: leading non-negligible coordinate positive
    c1.foreach { w =>
      val lead = w.indexWhere(x => math.abs(x) > 1e-9)
      assert(lead < 0 || w(lead) > 0)
    }
    val out = Similarity.pcaProject(emb, m1, c1).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (0 until 4).map(c => r.getAs[Double](s"pc$c"))).toMap
    // driver replay: centered-then-weighted strict fold + halfUp
    val vecs = emb.filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getAs[Long](0) -> r.getSeq[Float](1).toArray)
    assert(out.size == vecs.length)
    vecs.foreach { case (id, v) =>
      val want = (0 until 4).map { c =>
        var s = 0.0; var d = 0
        while (d < 64) { s += (v(d).toDouble - m1(d)) * c1(c)(d); d += 1 }
        math.floor(s * 1e4 + 0.5) / 1e4
      }
      assert(out(id) == want, s"vec $id")
    }
    // captured variance is non-increasing across components
    val vars = (0 until 4).map { c =>
      val xs = out.values.map(_(c)).toArray
      val mu = xs.sum / xs.length
      xs.map(x => (x - mu) * (x - mu)).sum / xs.length
    }
    assert(vars.sliding(2).forall { case Seq(a, b) => a >= b - 1e-9 },
      s"variances not ordered: $vars")
    // a planted dominant axis is recovered as pc0 (up to the sign rule)
    import spark.implicits._
    val axis = Array.tabulate(64)(d => if (d == 7) 1.0 else 0.0)
    val planted = (0 until 64).map { i =>
      (i.toLong, Array.tabulate(64)(d =>
        (axis(d) * (i % 13) + 0.01 * ((i * 31 + d) % 5)).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val (_, pcs) = Similarity.pcaFit(planted, p = 1)
    assert(math.abs(pcs(0)(7)) > 0.99,
      s"dominant axis not recovered: ${pcs(0).toSeq.take(10)}")
  }

  test("cosineNearDup returns only pairs above threshold, id_a < id_b") {
    val out = Similarity.cosineNearDup(emb, threshold = 0.9,
      nBits = 4, nTables = 4).collect()
    out.foreach { r =>
      assert(r.getAs[Long]("id_a") < r.getAs[Long]("id_b"))
      assert(r.getAs[Double]("cosine") >= 0.9)
    }
  }

  test("quantizeInt8: reconstruction within s/2, range clamped, zero vector guarded") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(0.5f, -1.0f, 0.25f)),
      (2L, Seq(0.0f, 0.0f, 0.0f)))          // zero vector → scale 0 → q 0
      .toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(df).collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    // vec 1: scale = 1.0/127; extreme dims hit exactly ±127·s
    val s1 = 1.0 / 127
    assert(out((1L, 1)) == ((s1, -127L)))
    assert(out((1L, 0))._2 == 64L)          // 0.5/s = 63.5 → floor(+0.5) = 64
    out.foreach { case ((_, _), (s, q)) => assert(q >= -127L && q <= 127L)
      assert(s >= 0.0) }
    // reconstruction error ≤ s/2 on every dim of vec 1
    val orig = Map(0 -> 0.5, 1 -> -1.0, 2 -> 0.25)
    (0 to 2).foreach { p =>
      val (s, q) = out((1L, p))
      assert(math.abs(orig(p) - q * s) <= s / 2 + 1e-12)
    }
    // zero vector: all q = 0
    (0 to 2).foreach(p => assert(out((2L, p))._2 == 0L))
    // corpus sanity on real data: every |q| ≤ 127 and per-vec max hits 127
    val real = Similarity.quantizeInt8(emb.limit(50))
    assert(real.agg(max(abs(col("q")))).first().getLong(0) == 127L)
  }

  test("semDedup drops a planted clone via keep-min, survivors partition the corpus") {
    import spark.implicits._
    // clone vector 3's embedding under a HIGHER id: identical vectors land
    // in the same cluster and score cosine 1.0, so the clone must drop and
    // the original survive
    val cloneSrc = emb.filter(col("vec_id") === 3L)
      .select(lit(999999L).as("vec_id"), col("embedding"), col("label"))
    val corpus = emb.unionByName(cloneSrc)
    val out = Similarity.semDedup(corpus, threshold = 0.99)
    val ids = out.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ids.contains(3L) && !ids.contains(999999L))
    // at an impossible threshold nothing drops: survivors == corpus
    val all = Similarity.semDedup(corpus, threshold = 1.01)
    assert(all.count() == corpus.count())
    // survivors ⊂ corpus and every cluster id is in [0, k)
    out.collect().foreach { r =>
      val c = r.getAs[Int]("cluster")
      assert(c >= 0 && c < 16)
    }
  }

  test("pqEncode: codeword twin encodes to itself, codes bounded, trained codebooks cut distortion") {
    val m = 8; val k = 16; val sub = 8
    val out = Similarity.pqEncode(emb, m, k).collect()
    assert(out.length.toLong == emb.count() * m)
    out.foreach { r =>
      val s = r.getAs[Int]("subspace"); val c = r.getAs[Int]("code")
      assert(s >= 0 && s < m && c >= 0 && c < k)
    }
    // seeded contract: codebook j of every subspace IS vector j's
    // subvector, so vector j (one of the k seeds) encodes to code j in
    // every subspace — its distance there is exactly 0.0
    val seeds = out.filter(_.getAs[Long]("vec_id") < k)
    assert(seeds.length == k * m)
    seeds.foreach { r =>
      assert(r.getAs[Int]("code").toLong == r.getAs[Long]("vec_id"))
    }
    // trained codebooks (Lloyd on the bounded sample) must not increase
    // total sample distortion vs the seeded init
    def distortion(cbs: Array[Array[Array[Double]]]): Double = {
      val sample = emb.orderBy("vec_id").limit(256)
        .select("embedding").collect()
        .map(_.getSeq[Float](0).toArray.map(_.toDouble))
      sample.map { v =>
        (0 until m).map { s =>
          cbs(s).map { cw =>
            (0 until sub).map { i =>
              val d = v(s * sub + i) - cw(i); d * d }.sum
          }.min
        }.sum
      }.sum
    }
    val seeded = Similarity.pqCodebooks(emb, m, k, iters = 0,
      maxTrainSamples = 256)
    val trained = Similarity.pqCodebooks(emb, m, k, iters = 5,
      maxTrainSamples = 256)
    val (d0, d5) = (distortion(seeded), distortion(trained))
    info(f"PQ sample distortion: seeded $d0%.2f -> trained $d5%.2f")
    assert(d5 <= d0)
    // explicit-codebook path agrees with the in-query seeded derivation
    val explicit = Similarity.pqEncode(emb, m, k, codebooks = Some(seeded))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(explicit == out.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet)
  }

  // Driver-side ADC reference with the ENGINES' exact fold order (index-
  // order subspace L2 from 0.0, then subspace-order adist sum from 0.0),
  // so equality assertions are bitwise, not approximate.
  private def adcReference(probes: Seq[(Long, Array[Double])],
                           corpus: Seq[(Long, Array[Double])],
                           cbs: Array[Array[Array[Double]]], topK: Int)
      : Set[(Long, Long, Double, Int)] = {
    val m = cbs.length; val sub = cbs(0)(0).length
    def l2(v: Array[Double], off: Int, cw: Array[Double]): Double = {
      var d = 0.0; var i = 0
      while (i < cw.length) { val t = v(off + i) - cw(i); d += t * t; i += 1 }
      d
    }
    val codes = corpus.map { case (id, v) =>
      id -> Array.tabulate(m) { s =>
        val ds = cbs(s).map(cw => l2(v, s * sub, cw))
        ds.indexOf(ds.min) // first minimum, same as array_position
      }
    }
    probes.flatMap { case (pid, pv) =>
      val dt = Array.tabulate(m)(s => cbs(s).map(cw => l2(pv, s * sub, cw)))
      codes.map { case (cid, cc) =>
        var a = 0.0; var s = 0
        while (s < m) { a += dt(s)(cc(s)); s += 1 }
        (pid, cid, a)
      }.sortBy { case (_, cid, a) => (a, cid) }
        .take(topK).zipWithIndex
        .map { case ((p, c, a), i) => (p, c, a, i + 1) }
    }.toSet
  }

  test("pqSearch: ADC ranks equal the driver reference bitwise on the gate carve") {
    val probes = emb.filter(col("vec_id") % 50 === 0)
    val corpus = emb.filter(col("vec_id") % 50 =!= 0)
    val out = Similarity.pqSearch(probes, corpus, topK = 3).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("cand_id"),
        r.getAs[Double]("adist"), r.getAs[Int]("rnk"))).toSet
    def collectVecs(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
        .toSeq
    val cbs = Similarity.pqCodebooks(corpus, m = 8, k = 16, iters = 0)
    val expected =
      adcReference(collectVecs(probes), collectVecs(corpus), cbs, topK = 3)
    assert(out == expected)
    out.foreach { case (_, _, a, _) => assert(a >= 0.0) }
  }

  test("ivfPqSearch: equals pqSearch exactly when probing all clusters; prunes under nprobe") {
    val probes = emb.filter(col("vec_id") % 50 === 0)
    val corpus = emb.filter(col("vec_id") % 50 =!= 0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("cand_id"),
        r.getAs[Double]("adist"), r.getAs[Int]("rnk"))).toSet
    // nprobe = kc -> the coarse filter admits every candidate, so the
    // two-level index must reproduce the flat ADC scan bit-for-bit
    val full = rows(Similarity.ivfPqSearch(probes, corpus, topK = 3,
      kc = 16, nprobe = 16))
    assert(full == rows(Similarity.pqSearch(probes, corpus, topK = 3)))
    // real pruning (nprobe = 4): still topK rows per probe here (clusters
    // hold plenty of candidates), every adist no better than the flat
    // scan's rank-1 (pruning can only lose candidates, never invent)
    val pruned = Similarity.ivfPqSearch(probes, corpus, topK = 3).collect()
    val flatBest = rows(Similarity.pqSearch(probes, corpus, topK = 1))
      .map { case (p, _, a, _) => p -> a }.toMap
    pruned.groupBy(_.getAs[Long]("probe_id")).foreach { case (p, rs) =>
      assert(rs.length == 3)
      assert(rs.map(_.getAs[Double]("adist")).min >= flatBest(p))
    }
  }

  test("ivfPqSearchRefined: equals the composed shortlist-then-exact-rerank reference") {
    val probes = emb.filter(col("vec_id") % 50 === 0)
    val corpus = emb.filter(col("vec_id") % 50 =!= 0)
    val topK = 3; val refine = 4
    val out = Similarity.ivfPqSearchRefined(probes, corpus, topK, refine)
      .collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("cand_id"),
        r.getAs[Double]("adist"), r.getAs[Int]("rnk"))).toSet
    // driver-side reference: the SAME ADC shortlist, exact squared-L2
    // recomputed in index order from 0.0 (the bruteL2TopK fold), cut at
    // topK by (dist, cand_id)
    val shortlist = Similarity.ivfPqSearch(probes, corpus, topK * refine)
      .select("probe_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def vecsOf(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
    val pv = vecsOf(probes); val cv = vecsOf(corpus)
    val expected = shortlist.map { case (p, c) =>
      var a = 0.0; var i = 0; val x = pv(p); val y = cv(c)
      while (i < x.length) {
        val d = x(i).toDouble - y(i).toDouble; a += d * d; i += 1
      }
      (p, c, a)
    }.groupBy(_._1).values.flatMap { rs =>
      rs.sortBy { case (_, c, a) => (a, c) }.take(topK).zipWithIndex
        .map { case ((p, c, a), i) => (p, c, a, i + 1) }
    }.toSet
    assert(out == expected)
  }

  test("self-join kNN graph: the halved (mirror-closure) path equals the generic path") {
    // r12 halving: same-reference probes/corpus with excludeSelf takes
    // the probe_id < cand_id half + mirror. Passing a non-reference-
    // equal copy of the SAME table forces the generic directed path —
    // the two must agree row for row (cosine(a,b) ≡ cosine(b,a) bitwise)
    val e = emb
    val copy = emb.filter(lit(true)) // value-identical, different reference
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("probe_id"),
        r.getAs[Long]("cand_id"), r.getAs[Double]("cosine"),
        r.getAs[Int]("rnk"))).toSet
    val halved = rows(Similarity.knnJoin(e, e, k = 2, excludeSelf = true))
    val generic = rows(Similarity.knnJoin(e, copy, k = 2, excludeSelf = true))
    assert(halved.nonEmpty && halved == generic)
  }

  test("knnJoinPq equals ivfPqSearchRefined at the same dials, and has no probe broadcast") {
    // the join twin's ONLY difference is join strategy (no probe-side
    // broadcast hint) — values must be identical row for row
    val probes = emb.filter(col("vec_id") % 50 === 0)
    val corpus = emb.filter(col("vec_id") % 50 =!= 0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("probe_id"),
        r.getAs[Long]("cand_id"), r.getAs[Double]("adist"),
        r.getAs[Int]("rnk"))).toSet
    val joined = Similarity.knnJoinPq(probes, corpus, topK = 3, refine = 4)
    assert(rows(joined)
      == rows(Similarity.ivfPqSearchRefined(probes, corpus, topK = 3,
        refine = 4)))
    // the deployment contract: no FORCED broadcast anywhere in the plan
    // (AQE may still pick broadcast at runtime for a genuinely small
    // side — the point is the logical plan carries no hint; after
    // EliminateResolvedHint a forced broadcast survives as a join-node
    // `strategy=broadcast` hint)
    val optimized = joined.queryExecution.optimizedPlan.toString
    assert(!optimized.toLowerCase.contains("broadcast"),
      s"knnJoinPq must not force a broadcast:\n$optimized")
  }

  test("ivfPqSearchRefined: refine=1 keeps the ADC candidate set, reorders by exact") {
    val probes = emb.filter(col("vec_id") % 50 === 0)
    val corpus = emb.filter(col("vec_id") % 50 =!= 0)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("probe_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(
      pairs(Similarity.ivfPqSearchRefined(probes, corpus, topK = 3,
        refine = 1))
        == pairs(Similarity.ivfPqSearch(probes, corpus, topK = 3)))
  }

  test("refined recall dominates unrefined on the gate carve") {
    // deterministic at the spec SF: both gates share the carve and the
    // untrained (iters=0 seeded) quantizers, so the means are constants;
    // the refine step may only ADD truth hits (exact rerank of a
    // superset shortlist), measured as a strict win here
    val probes = emb.filter(col("vec_id") % 50 === 0)
    val corpus = emb.filter(col("vec_id") % 50 =!= 0)
    def mean(df: org.apache.spark.sql.DataFrame) =
      df.agg(avg(col("recall"))).head().getDouble(0)
    val base = mean(Similarity.recallIvfPq(probes, corpus, topK = 5))
    val refined = mean(
      Similarity.recallIvfPqRefined(probes, corpus, topK = 5, refine = 4))
    assert(refined >= base,
      s"refined $refined < unrefined $base")
    assert(refined > 0.0)
  }

  test("pqSearch: a planted twin attains the per-probe ADC lower bound at rank 1") {
    import spark.implicits._
    val corpus = emb.filter(col("vec_id") < 40)
    // the probe IS corpus vector 20 (not a codeword seed: those are
    // ids 0..15), so its codes are the per-subspace argmins of its own
    // distance table and its adist is exactly sum_s min(dt_s) — the
    // smallest ADC distance any candidate can attain
    val twinVec = corpus.filter(col("vec_id") === 20)
      .select("embedding").collect().head.getSeq[Float](0).toArray
    val probes = Seq((1000L, twinVec)).toDF("vec_id", "embedding")
    val out = Similarity.pqSearch(probes, corpus, topK = 3).collect()
      .sortBy(_.getAs[Int]("rnk"))
    val cbs = Similarity.pqCodebooks(corpus, m = 8, k = 16, iters = 0)
    val pv = twinVec.map(_.toDouble)
    val lowerBound = (0 until 8).map { s =>
      cbs(s).map { cw =>
        var d = 0.0; var i = 0
        while (i < 8) { val t = pv(s * 8 + i) - cw(i); d += t * t; i += 1 }
        d
      }.min
    }.foldLeft(0.0)(_ + _)
    assert(out.head.getAs[Double]("adist") == lowerBound)
    val twinRow = out.filter(_.getAs[Long]("cand_id") == 20L)
    assert(twinRow.nonEmpty && twinRow.head.getAs[Double]("adist") == lowerBound)
  }

  test("pqDistortion: seeds reconstruct exactly, training never increases total distortion") {
    val out = Similarity.pqDistortion(emb).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("distortion")).toMap
    assert(out.size.toLong == emb.count())
    out.values.foreach(d => assert(d >= 0.0))
    // seeded contract: vectors 0..15 ARE the codewords in every
    // subspace, so their reconstruction is lossless
    (0L until 16L).foreach(id => assert(out(id) == 0.0))
    assert(out.values.sum > 0.0) // non-seeds have real quantization loss
    // trained codebooks must not increase the corpus-wide distortion
    val trained = Similarity.pqCodebooks(emb, iters = 5)
    val trainedTotal = Similarity.pqDistortion(emb, codebooks = Some(trained))
      .agg(sum(col("distortion"))).collect().head.getDouble(0)
    info(f"PQ total distortion: seeded ${out.values.sum}%.3f -> trained $trainedTotal%.3f")
    assert(trainedTotal <= out.values.sum)
  }

  test("normFilter flags zero, ragged, runaway, null, and NaN vectors; passes healthy ones") {
    import spark.implicits._
    val rows = Seq(
      (1L, Array.fill(64)(0.125f)),            // healthy: norm_sq = 1.0
      (2L, Array.fill(64)(0.0f)),              // dead: zero norm
      (3L, Array.fill(32)(0.2f)),              // ragged: 32 dims
      (4L, Array.fill(64)(10.0f)),             // runaway norm
      (5L, null.asInstanceOf[Array[Float]]),   // missing vector
      (6L, Array.fill(64)(Float.NaN)))         // corrupt encoder output
      .toDF("vec_id", "embedding")
      // interior-null element (a parquet float list CAN carry one):
      // aggregate's fold hits acc + null → null norm_sq → norm_ok 0 on
      // BOTH engines, so the validator catches element nulls too
      .unionByName(Seq(7L).toDF("vec_id").selectExpr("vec_id",
        "transform(sequence(1, 64), i -> if(i = 3, " +
          "cast(null as float), cast(0.125 as float))) as embedding"))
    val out = graft.similarity.Similarity.normFilter(rows)
      .collect().map(r => r.getLong(0) ->
        ((r.isNullAt(1), if (r.isNullAt(2)) Double.NaN else r.getDouble(2),
          r.getInt(3), r.getInt(4)))).toMap
    assert(out(1L) == ((false, 1.0, 1, 1)))
    assert(out(2L) == ((false, 0.0, 1, 0)))
    assert(out(3L)._3 == 0)
    assert(out(4L)._3 == 1 && out(4L)._4 == 0)
    // null vector: both metrics null, both flags 0 — the audit VERDICTS
    // a missing embedding (null predicates fall to otherwise(0)); it
    // never silently drops or passes one
    assert(out(5L)._1 && out(5L)._3 == 0 && out(5L)._4 == 0)
    // NaN norm: Spark orders NaN above every value, so the <= hi² bound
    // fails and the flag lands 0 — the screen catches corrupt floats
    // without an explicit isnan branch
    assert(out(6L)._2.isNaN && out(6L)._3 == 1 && out(6L)._4 == 0)
    // interior null: dims full-length but norm_sq null → norm_ok 0
    assert(out(7L)._2.isNaN && out(7L)._3 == 1 && out(7L)._4 == 0)
  }

  test("project: matches a driver-side replay of the same signs, linear in the input") {
    import spark.implicits._
    val v1 = Array.tabulate(64)(i => (i % 7 - 3) * 0.25f)
    val v2 = Array.tabulate(64)(i => math.sin(i.toDouble).toFloat)
    val rows = Seq((1L, v1), (2L, v2),
      (3L, v1.zip(v2).map { case (a, b) => a + b })).toDF("vec_id", "embedding")
    val out = graft.similarity.Similarity.project(rows, outDims = 4)
      .collect().map(r => r.getLong(0) ->
        (1 to 4).map(j => r.getDouble(j)).toArray).toMap
    // driver replay: same sign generator, same index-order double fold,
    // same multiply-then-round sequence
    val scale = 1.0 / math.sqrt(4.0)
    def replay(v: Array[Float]): Array[Double] =
      Array.tabulate(4) { j =>
        var acc = 0.0
        v.indices.foreach { d =>
          acc += v(d).toDouble *
            graft.similarity.Similarity.planeSign((1 << 20) + j, d)
        }
        BigDecimal(acc * scale)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    assert(out(1L).sameElements(replay(v1)))
    assert(out(2L).sameElements(replay(v2)))
    // linearity within rounding: project(x+y) ≈ project(x)+project(y)
    (0 until 4).foreach { j =>
      assert(math.abs(out(3L)(j) - (out(1L)(j) + out(2L)(j))) < 2e-4)
    }
  }
}

