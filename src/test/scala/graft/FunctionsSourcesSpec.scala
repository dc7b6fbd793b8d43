package graft

import org.apache.spark.sql.functions._

import graft.config.{ColumnSpec, TableConfig}
import graft.sources.Sources

class FunctionsSourcesSpec extends SparkSpec {
  import spark.implicits._

  test("native cosine_sim matches hand-computed value and builtin chain") {
    val df = Seq((Array(1.0f, 0.0f, 1.0f), Array(0.0f, 1.0f, 1.0f)))
      .toDF("a", "b")
    val native = df.select(expr("cosine_sim(a, b)")).collect().head.getDouble(0)
    assert(math.abs(native - 0.5) < 1e-12) // dot=1, |a|=|b|=sqrt(2)
    val builtin = df.select(
      expr("""aggregate(zip_with(a, b, (x, y) -> cast(x as double) * cast(y as double)), cast(0.0 as double), (acc, v) -> acc + v)
           / (sqrt(aggregate(transform(a, x -> cast(x as double) * cast(x as double)), cast(0.0 as double), (acc, v) -> acc + v))
            * sqrt(aggregate(transform(b, x -> cast(x as double) * cast(x as double)), cast(0.0 as double), (acc, v) -> acc + v)))"""))
      .collect().head.getDouble(0)
    assert(native == builtin)
  }

  test("cosine_sim is null-safe") {
    val df = Seq((Some(Array(1.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
    assert(df.select(expr("cosine_sim(a, b)")).collect().head.isNullAt(0))
  }

  test("cosine_sim agrees with the full interpreted path on real vectors") {
    val emb = Tables(spark, sfDir, "embeddings").limit(20).cache()
    val pairs = emb.select(col("vec_id").as("ia"), col("embedding").as("va"))
      .crossJoin(emb.select(col("vec_id").as("ib"), col("embedding").as("vb")))
      .filter(col("ia") < col("ib"))
    val diff = pairs.select(
      (expr("cosine_sim(va, vb)") -
        expr("""aggregate(zip_with(va, vb, (x, y) -> cast(x as double) * cast(y as double)), cast(0.0 as double), (acc, v) -> acc + v)
             / (sqrt(aggregate(transform(va, x -> cast(x as double) * cast(x as double)), cast(0.0 as double), (acc, v) -> acc + v))
              * sqrt(aggregate(transform(vb, x -> cast(x as double) * cast(x as double)), cast(0.0 as double), (acc, v) -> acc + v)))"""))
        .as("d"))
    assert(diff.agg(max(abs(col("d")))).collect().head.getDouble(0) == 0.0)
  }

  test("cosine_sim returns 0.0 (not NaN) on zero-norm vectors") {
    val df = Seq((Array(0.0f, 0.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    assert(df.select(expr("cosine_sim(a, b)")).collect().head.getDouble(0) == 0.0)
    assert(df.select(expr("cosine_sim(b, a)")).collect().head.getDouble(0) == 0.0)
  }

  test("native centroid_dists equals the composed zip_with fallback") {
    val cents = Array(Array(0.0, 0.0, 0.0), Array(1.0, -2.5, 0.125))
    val lit2d = cents
      .map(_.map(x => s"cast('$x' as double)").mkString("array(", ",", ")"))
      .mkString("array(", ",", ")")
    val df = Seq(Array(1.0f, 2.0f, 3.0f), Array(-0.5f, 0.0f, 4.25f))
      .toDF("v")
    def l2(c: Int) =
      s"""aggregate(zip_with(v, $lit2d[$c], (x, p) -> (cast(x as double) - p) * (cast(x as double) - p)),
         cast(0.0 as double), (acc, u) -> acc + u)"""
    val out = df.select(
      expr(s"centroid_dists(v, $lit2d)").as("native"),
      expr(s"array(${l2(0)}, ${l2(1)})").as("composed")).collect()
    out.foreach { r =>
      assert(r.getSeq[Double](0) == r.getSeq[Double](1))
    }
    // hand-check one value: |(1,2,3) - (0,0,0)|^2 = 14
    assert(out.head.getSeq[Double](0).head == 14.0)
  }

  test("native l2_sq equals the zip_with fold bitwise on real vectors") {
    val emb = Tables(spark, sfDir, "embeddings").limit(20).cache()
    val pairs = emb.select(col("vec_id").as("ia"), col("embedding").as("va"))
      .crossJoin(emb.select(col("vec_id").as("ib"), col("embedding").as("vb")))
      .filter(col("ia") < col("ib"))
    val diff = pairs.select(
      (expr("l2_sq(va, vb)") -
        expr("""aggregate(
             zip_with(va, vb,
               (x, y) -> (cast(x as double) - cast(y as double))
                       * (cast(x as double) - cast(y as double))),
             cast(0.0 as double), (acc, v) -> acc + v)""")).as("d"))
    assert(diff.agg(max(abs(col("d")))).collect().head.getDouble(0) == 0.0)
    // hand value: |(1,2) - (0,0)|^2 = 5; and null-intolerance
    val small = Seq((Array(1.0f, 2.0f), Array(0.0f, 0.0f))).toDF("a", "b")
    assert(small.select(expr("l2_sq(a, b)")).collect().head.getDouble(0) == 5.0)
    val nul = Seq((Some(Array(1.0f)), Option.empty[Array[Float]])).toDF("a", "b")
    assert(nul.select(expr("l2_sq(a, b)")).collect().head.isNullAt(0))
  }

  test("native adc_dist equals the element_at fold; OOB code is null") {
    // dt: 2 subspaces x 3 codes; codes pick dt[0][1]=0.5 and dt[1][2]=8.0
    val df = Seq((
      Array(Array(0.25, 0.5, 1.0), Array(2.0, 4.0, 8.0)),
      Array(1, 2))).toDF("dt", "codes")
    val out = df.select(
      expr("adc_dist(dt, codes)").as("native"),
      expr("""aggregate(
           zip_with(dt, codes, (t, c) -> element_at(t, cast(c + 1 as int))),
           cast(0.0 as double), (acc, v) -> acc + v)""").as("composed"))
      .collect().head
    assert(out.getDouble(0) == 8.5)
    assert(out.getDouble(0) == out.getDouble(1))
    val oob = Seq((Array(Array(0.25, 0.5)), Array(7))).toDF("dt", "codes")
    assert(oob.select(expr("adc_dist(dt, codes)")).collect().head.isNullAt(0))
  }

  test("l2_sq and adc_dist null ELEMENTS poison to null like the composed folds") {
    // composed zip_with/aggregate: any null element → null total
    val nf = Seq((Array[java.lang.Float](1.0f, null), Array[java.lang.Float](0.0f, 2.0f)))
      .toDF("a", "b")
    val l2 = nf.select(
      expr("l2_sq(a, b)").as("native"),
      expr("""aggregate(
           zip_with(a, b,
             (x, y) -> (cast(x as double) - cast(y as double))
                     * (cast(x as double) - cast(y as double))),
           cast(0.0 as double), (acc, v) -> acc + v)""").as("composed"))
      .collect().head
    assert(l2.isNullAt(0) && l2.isNullAt(1))
    val nc = Seq((Array(Array(0.25, 0.5), Array(2.0, 4.0)),
      Array[Integer](1, null))).toDF("dt", "codes")
    val ad = nc.select(
      expr("adc_dist(dt, codes)").as("native"),
      expr("""aggregate(
           zip_with(dt, codes, (t, c) -> element_at(t, cast(c + 1 as int))),
           cast(0.0 as double), (acc, v) -> acc + v)""").as("composed"))
      .collect().head
    assert(ad.isNullAt(0) && ad.isNullAt(1))
  }

  test("fused pq_codes/pq_dt equal the composed slice chain bitwise") {
    // m=4 subspaces x k=3 codewords x sub=2 dims over 8-dim vectors;
    // codeword values chosen so ties exercise the first-minimum rule
    // (codes 0 and 1 of subspace 2 are identical)
    val cbs = Array(
      Array(Array(0.0, 0.0), Array(1.0, 1.0), Array(-2.0, 0.5)),
      Array(Array(0.25, -0.25), Array(0.0, 0.0), Array(3.0, 3.0)),
      Array(Array(0.5, 0.5), Array(0.5, 0.5), Array(0.0, 1.0)),
      Array(Array(-1.0, 2.0), Array(0.125, 0.0), Array(2.0, -2.0)))
    val lit3d = cbs.map(_.map(_.map(x => s"cast('$x' as double)")
        .mkString("array(", ",", ")")).mkString("array(", ",", ")"))
      .mkString("array(", ",", ")")
    val df = Seq(
      Array(1.0f, 2.0f, 0.1f, -0.1f, 0.5f, 0.5f, 0.0f, 0.0f),
      Array(-2.0f, 0.5f, 3.0f, 3.0f, 0.0f, 1.0f, 0.125f, 0.0f))
      .toDF("v")
    def composed(s: Int) = {
      val cw = cbs(s).map(_.map(x => s"cast('$x' as double)")
        .mkString("array(", ",", ")")).mkString("array(", ",", ")")
      s"centroid_dists(slice(v, ${s * 2 + 1}, 2), $cw)"
    }
    val codesComposed = (0 until 4)
      .map(s => s"cast(array_position(${composed(s)}, array_min(${composed(s)})) - 1 as int)")
      .mkString("array(", ",", ")")
    val dtComposed = (0 until 4).map(composed).mkString("array(", ",", ")")
    val out = df.select(
      expr(s"pq_codes(v, $lit3d)").as("nc"),
      expr(codesComposed).as("cc"),
      expr(s"pq_dt(v, $lit3d)").as("nd"),
      expr(dtComposed).as("cd")).collect()
    out.foreach { r =>
      assert(r.getSeq[Int](0) == r.getSeq[Int](1))
      assert(r.getSeq[Seq[Double]](2) == r.getSeq[Seq[Double]](3))
    }
    // tie lands on the FIRST of the identical codewords
    assert(out.head.getSeq[Int](0)(2) == 0)
    // second vector matches each subspace's planted codeword exactly
    assert(out(1).getSeq[Int](0).toList == List(2, 2, 2, 1))
  }

  test("native md5 hashes equal the string-composition fallbacks") {
    val df = Seq("abc", "", "the fast key", "x,y z").toDF("w")
    val p = graft.dedup.MinHashSpec.P
    val pairs8 = (0 until 8)
      .map(i => s"substring(md5(w), ${31 - 2 * i}, 2)").mkString(", ")
    val out = df.select(
      expr("md5_mod_p(w)").as("native_p"),
      expr(s"cast(cast(conv(concat($pairs8), 16, 10) as decimal(20,0)) % $p as bigint)")
        .as("fallback_p"),
      expr("md5_h32(w)").as("native_h32"),
      expr(graft.dedup.MinHashSpec.sparkH32Expr("w")).as("fallback_h32"))
      .collect()
    out.foreach { r =>
      assert(r.getLong(0) == r.getLong(1))
      assert(r.getLong(2) == r.getLong(3))
    }
    // known value: md5_number_lower('abc') = 8250560606382298838
    val abc = df.filter(col("w") === "abc").select(expr("md5_h32(w)"))
    // 8250560606382298838 >>> 32 = 1921049896
    assert(out.nonEmpty)
    assert(df.select(expr("md5_h32(w)")).collect()
      .exists(_.getLong(0) == (8250560606382298838L >>> 32)))
    assert(df.select(expr("md5_mod_p(w)")).collect()
      .exists(_.getLong(0) == java.lang.Long.remainderUnsigned(8250560606382298838L, p)))
  }

  test("native md5_fp62 equals the composed h32/mod_p fingerprint") {
    val df = Seq("abc", "", "the fast key", "x,y z").toDF("w")
    val p = graft.dedup.MinHashSpec.P
    val out = df.select(
      expr("md5_fp62(w)").as("fused"),
      expr("(md5_h32(w) % 2147483648L) * 4294967296L + md5_mod_p(w)")
        .as("composed"))
      .collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // known value from md5_number_lower('abc') = 8250560606382298838
    val u = 8250560606382298838L
    val want = ((u >>> 32) % 2147483648L) * 4294967296L +
      java.lang.Long.remainderUnsigned(u, p)
    assert(df.select(expr("md5_fp62(w)")).collect()
      .exists(_.getLong(0) == want))
  }

  test("minhash_bandsigs equals the composed shingle/minhash/band spelling") {
    import graft.dedup.MinHashSpec
    import graft.text.Text
    // real docs + the hostile-row sweep: null, empty, whitespace-only,
    // fewer-than-k tokens (partial shingle), duplicate shingles, mixed
    // case/whitespace normalization
    val hostile = Seq[(Long, String)](
      (9001L, null), (9002L, ""), (9003L, "   "), (9004L, "one"),
      (9005L, "two tokens"), (9006L, "a b a b a b a b"),
      (9007L, "The  QUICK\tbrown fox\njumps over the lazy dog"),
      // tab/newline-only text: trim() is SPACE-only in BOTH engines, so
      // this tokenizes to ["",""] whose single shingle is " " — under
      // the r11-era `s != ''` filter every such doc SHARED that one
      // shingle (one false near-dup class; one LSH bucket bomb per band
      // in streaming). r12 extends the degenerate-doc contract to all-
      // whitespace text: the filter is now `trim(s) != ''` in BOTH
      // engines and the fused kernel, so this row gets NO signature.
      (9008L, " \t\n "))
      .toDF("doc_id", "text")
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).limit(200)
      .unionByName(hostile)
      .withColumn("__toks", Text.tokens(col("text")))
      .withColumn("__shingles",
        expr(Text.shingleExpr("__toks", MinHashSpec.SHINGLE_K)))
      .withColumn("__hashes",
        expr(s"transform(__shingles, w -> ${MinHashSpec.hpExpr(spark, "w")})"))
    val mh = (0 until MinHashSpec.K).map { i =>
      expr(s"""array_min(transform(__hashes,
           h -> (h * ${MinHashSpec.a(i)}L
                 + ${MinHashSpec.b(i)}L) % ${MinHashSpec.P}))""").as(s"mh_$i")
    }
    val composedBands = (0 until MinHashSpec.BANDS).map { j =>
      val cs = (j * MinHashSpec.ROWS until (j + 1) * MinHashSpec.ROWS)
        .map(i => col(s"mh_$i"))
      concat_ws("_", cs: _*)
    }
    val out = df
      .select(col("doc_id") +: expr("minhash_bandsigs(__toks)").as("fused") +:
        col("__toks").isNull.as("toks_null") +: mh: _*)
      .withColumn("composed",
        // null TEXT tokenizes to a null array (split null-propagates),
        // and the null-intolerant fused expr mirrors that as null;
        // zero-shingle docs (empty/ws-only text) mirror as EMPTY.
        // posexplode drops BOTH — null vs empty is invisible downstream.
        when(col("toks_null"), lit(null).cast("array<string>"))
          .when(col("mh_0").isNotNull, array(composedBands: _*))
          .otherwise(array().cast("array<string>")))
      .select("doc_id", "fused", "composed")
      .collect()
    assert(out.length > 200)
    out.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"doc ${r.getLong(0)}: fused=${r.getSeq[String](1)} composed=${r.getSeq[String](2)}")
    }
    // null text → null (posexplode drops); empty/whitespace-only →
    // EMPTY array (posexplode drops): degenerate docs need no filter
    assert(out.find(_.getLong(0) == 9001L).get.isNullAt(1))
    Seq(9002L, 9003L, 9008L).foreach { id =>
      val row = out.find(_.getLong(0) == id).get
      assert(row.getSeq[String](1).isEmpty, s"doc $id should have no band sigs")
    }
    // a real doc gets exactly BANDS sigs
    assert(out.find(_.getLong(0) == 9007L).get.getSeq[String](1).length
      == MinHashSpec.BANDS)
    // null tokens array (null text) → null in, but through tokens()
    // null text tokenizes to [""] per trim/split, which shingles to
    // nothing; ALSO pin the raw-null-child contract
    val rawNull = spark.sql("SELECT minhash_bandsigs(cast(null as array<string>)) AS s")
      .collect()
    assert(rawNull.head.isNullAt(0))
  }

  test("no-extension fallbacks: batch signatures value-equal, stream generator resolves") {
    import graft.dedup.MinHashSpec
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).limit(100)
    val fused = MinHashSpec.signatures(docs, "doc_id", "text")
      .collect().map(_.toSeq).toSet
    val reg = spark.sessionState.functionRegistry
    val sigId = FunctionIdentifier("minhash_sig")
    val bandId = FunctionIdentifier("minhash_bandsigs")
    assert(reg.functionExists(sigId) && reg.functionExists(bandId))
    try {
      reg.dropFunction(sigId): Unit
      reg.dropFunction(bandId): Unit
      assert(!spark.catalog.functionExists("minhash_sig"))
      // batch branch: the composed explode/groupBy spelling, same values
      val composed = MinHashSpec.signatures(docs, "doc_id", "text")
        .collect().map(_.toSeq).toSet
      assert(composed == fused)
      // the silent-slow-path fix (VERDICT r11 item 6): taking the
      // fallback branch logs a one-time WARN naming the cost class —
      // fired now, and a second take of the branch does NOT re-fire
      assert(graft.functions.FallbackWarnings.hasFired("minhash_sig-fallback"))
      MinHashSpec.signatures(docs, "doc_id", "text"): Unit
      assert(!graft.functions.FallbackWarnings.warnOnce(
        "minhash_sig-fallback", "must not re-log"))
      // stream branch: the fallback must RESOLVE end to end (the fused
      // spelling would throw an undefined-function AnalysisException at
      // the banded select) — construction analyzes every stage
      val stream = graft.streaming.Streams.lshCandidatesStream(
        docs.withColumn("ts",
          lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))))
      assert(stream.schema.fieldNames.toSeq == Seq("doc_a", "doc_b"))
      // the stream fallback's one-time WARN fired too
      assert(graft.functions.FallbackWarnings.hasFired(
        "minhash_bandsigs-fallback"))
    } finally {
      val (i1, e1, b1) = graft.functions.GraftFunctions.minhashSigDescriptor
      val (i2, e2, b2) =
        graft.functions.GraftFunctions.minhashBandSigsDescriptor
      reg.registerFunction(i1, e1, b1): Unit
      reg.registerFunction(i2, e2, b2): Unit
    }
  }

  test("fused minhash_sig signatures equal the composed explode/groupBy spelling") {
    import graft.dedup.MinHashSpec
    import graft.text.Text
    // same hostile sweep as the band-sig parity test: the fused batch
    // path must DROP exactly the docs the composed explode drops —
    // null/empty/ALL-whitespace text (tab-only included since the r12
    // trim(s) != '' contract extension)
    val hostile = Seq[(Long, String)](
      (9001L, null), (9002L, ""), (9003L, "   "), (9004L, "one"),
      (9005L, "two tokens"), (9006L, "a b a b a b a b"),
      (9007L, "The  QUICK\tbrown fox\njumps over the lazy dog"),
      (9008L, " \t\n "))
      .toDF("doc_id", "text")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).limit(200)
      .unionByName(hostile)
    // fused (the registered-session path signatures() now takes)
    assert(spark.catalog.functionExists("minhash_sig"))
    val fused = MinHashSpec.signatures(docs, "doc_id", "text")
    // composed spelling, inline (the fallback path)
    val words = docs
      .withColumn("__toks", Text.tokens(col("text")))
      .select(col("doc_id"),
        explode(expr(Text.shingleExpr("__toks", MinHashSpec.SHINGLE_K))).as("w"))
      .withColumn("__hp", expr(MinHashSpec.hpExpr(spark, "w")))
    val aggs = (0 until MinHashSpec.K).map(i =>
      min(expr(s"(__hp * ${MinHashSpec.a(i)}L + ${MinHashSpec.b(i)}L) % ${MinHashSpec.P}"))
        .as(s"mh_$i"))
    val composed = words.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
    val f = fused.orderBy("doc_id").collect()
    val c = composed.orderBy("doc_id").collect()
    assert(f.length == c.length && f.length > 190)
    f.zip(c).foreach { case (a, b) => assert(a == b, s"fused $a vs composed $b") }
    // row-set contract: ALL degenerate docs absent (tab-only included),
    // real single-token doc present
    val ids = f.map(_.getLong(0)).toSet
    assert(!ids.contains(9001L) && !ids.contains(9002L) &&
      !ids.contains(9003L) && !ids.contains(9008L))
    assert(ids.contains(9004L))
    // and the signature stage is shuffle-free: no Exchange in the plan
    // (checked over the raw scan — the test frame's limit()/local-union
    // adds its own SinglePartition exchange unrelated to signatures)
    val plan = MinHashSpec.signatures(
        spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"fused signatures should not shuffle:\n$plan")
  }

  test("minhash natives: codegen path equals interpreted eval (r12 doGenCode)") {
    // r11 shipped minhash_bandsigs/minhash_sig as CodegenFallback —
    // the only natives outside whole-stage codegen (VERDICT r11 item
    // 2). r12 adds doGenCode as a static call into the shared
    // JIT-compiled kernel; this pins that the generated path and the
    // interpreted path (factoryMode=NO_CODEGEN) produce identical
    // values over real + hostile rows — and that the expressions are
    // genuinely not CodegenFallback anymore.
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    val e = graft.functions.MinhashBandSigs(
      org.apache.spark.sql.catalyst.expressions.Literal(null))
    val s = graft.functions.MinhashSigRows(
      org.apache.spark.sql.catalyst.expressions.Literal(null))
    assert(!e.isInstanceOf[CodegenFallback] && !s.isInstanceOf[CodegenFallback])
    val hostile = Seq[(Long, String)](
      (9001L, null), (9002L, ""), (9003L, "   "), (9004L, "one"),
      (9005L, "two tokens"), (9008L, " \t\n "))
      .toDF("doc_id", "text")
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).limit(100)
      .unionByName(hostile)
      .withColumn("__toks", graft.text.Text.tokens(col("text")))
    def run(): Seq[(Long, Seq[String], Seq[Seq[Long]])] =
      df.selectExpr("doc_id", "minhash_bandsigs(__toks) AS b",
          "minhash_sig(__toks) AS s")
        .orderBy("doc_id").collect().toSeq.map { r =>
          (r.getLong(0),
           if (r.isNullAt(1)) null else r.getSeq[String](1),
           if (r.isNullAt(2)) null
           else r.getSeq[scala.collection.Seq[Long]](2).map(_.toSeq))
        }
    val viaCodegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val viaInterp = run()
      assert(viaCodegen.size == viaInterp.size && viaCodegen.nonEmpty)
      viaCodegen.zip(viaInterp).foreach { case (a, b) =>
        assert(a == b, s"codegen $a vs interpreted $b")
      }
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("copyInto reads lake csv per config, auto-creates missing columns, stamps audit") {
    val dir = tempDir("graft_ci")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/lake.csv"),
      "id|name\n1|a\n2|b\n")
    val cfg = TableConfig.fromYaml(
      """to_schema: raw
        |to_table: lake_load
        |field_term: "|"
        |first_row: 2
        |vars:
        |    id: BIGINT
        |    name: VARCHAR(8)
        |    added_later: INTEGER
        |""".stripMargin)
    val out = Sources.copyInto(spark, cfg, s"$dir/lake.csv", "b42",
      format = "csv", idCols = Seq("id"))
    val rows = out.orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows.head.getLong(0) == 1L && rows.head.getString(1) == "a")
    assert(rows.forall(_.isNullAt(2)))          // auto-created typed NULL column
    assert(rows.forall(_.getString(3) == "b42")) // etl_batch_id
    assert(!rows.head.isNullAt(4))               // content-derived etl_load_row
  }

  test("writeTable honors format + compression options") {
    val dir = tempDir("graft_wt")
    val df = Seq((1, "a"), (2, "b")).toDF("k", "v")
    Sources.writeTable(df, s"$dir/t", compression = Some("gzip"))
    val files = new java.io.File(s"$dir/t").listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".gz.parquet")))
    assert(spark.read.parquet(s"$dir/t").count() == 2)
  }

  test("reclusterTable rewrites an unclustered table with clustered layout in place") {
    val dir = tempDir("graft_rc")
    val df = Seq((3, "c"), (1, "a"), (2, "b")).toDF("k", "v")
    Sources.writeTable(df, s"$dir/t") // unclustered bulk load
    Sources.reclusterTable(spark, s"$dir/t", clusterKeys = Seq("k"))
    val back = spark.read.parquet(s"$dir/t")
    assert(back.count() == 3)
    assert(back.orderBy("k").collect().map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    assert(!new java.io.File(s"$dir/t__reclustered").exists()) // swap cleaned up
  }

  test("quarantined delimited load captures malformed lines, not silent NULLs") {
    val dir = tempDir("graft_q")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/in.csv"),
      "id,v\n1,10\nnot_a_number,20\n3,30\n")
    val cfg = TableConfig(
      toTable = "t",
      vars = Seq(ColumnSpec("id", "BIGINT"), ColumnSpec("v", "BIGINT")),
      filePath = Map("overall" -> s"$dir/in.csv"),
      fieldTerm = Map("overall" -> ","))
    // no caller-side cache: the loader must return a frame on which the
    // corrupt-record split queries are legal. Start from an empty cache
    // so the hygiene assertion below isolates the loader (this suite's
    // own embeddings fixture is cached test-scoped).
    spark.catalog.clearCache()
    val out = Sources.loadDelimited(spark, cfg, quarantine = true)
    val bad = out.filter(col("_corrupt_record").isNotNull).collect()
    assert(bad.length == 1)
    assert(bad.head.getAs[String]("_corrupt_record") == "not_a_number,20")
    assert(out.filter(col("_corrupt_record").isNull).count() == 2)
    // cache hygiene: the loader materializes via localCheckpoint, so the
    // quarantine frame must not leave an entry in the CacheManager (the
    // pre-r6 `.cache()` leaked one per quarantine load, never unpersisted)
    assert(spark.sharedState.cacheManager.isEmpty,
      "loadDelimited left the quarantine frame registered in the CacheManager")
  }

  test("delimited load honors field terminator, header skip, and schema") {
    val dir = tempDir("graft_src")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/data.csv"),
      "id|name|amt\n1|alpha|1.5\n2|beta|2.5\n")
    val cfg = TableConfig(
      toTable = "t",
      vars = Seq(ColumnSpec("id", "BIGINT"), ColumnSpec("name", "VARCHAR(10)"),
        ColumnSpec("amt", "FLOAT")),
      filePath = Map("overall" -> s"$dir/data.csv"),
      fieldTerm = Map("overall" -> "|"),
      firstRow = 2)
    val out = Sources.loadDelimited(spark, cfg).orderBy("id").collect()
    assert(out.length == 2)
    assert(out(0).getLong(0) == 1L && out(0).getString(1) == "alpha"
      && out(0).getDouble(2) == 1.5)
  }

  test("year-partitioned load pads year-specific columns and unions") {
    val dir = tempDir("graft_years")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/y2014.csv"), "id,flag\n1,9\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/y2015.csv"), "id\n2\n")
    val cfg = TableConfig(
      toTable = "t",
      vars = Seq(ColumnSpec("id", "BIGINT")),
      years = Seq(2014, 2015),
      yearVars = Map(2014 -> Seq(ColumnSpec("flag", "INTEGER"))),
      filePath = Map("2014" -> s"$dir/y2014.csv", "2015" -> s"$dir/y2015.csv"),
      fieldTerm = Map("overall" -> ","),
      firstRow = 2)
    val out = Sources.loadYears(spark, cfg).orderBy("id").collect()
    assert(out.length == 2)
    assert(out(0).getInt(1) == 9 && out(1).isNullAt(1))
  }

  test("json source applies explicit schema without an inference scan") {
    val dir = tempDir("graft_json")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/d.json"),
      """{"id": 1, "name": "x", "amt": 1.5}
        |{"id": 2, "name": "y"}
        |""".stripMargin)
    val out = Sources.loadJson(spark,
      Seq(ColumnSpec("id", "BIGINT"), ColumnSpec("name", "VARCHAR(8)"),
        ColumnSpec("amt", "FLOAT")), s"$dir/d.json")
      .orderBy("id").collect()
    assert(out.length == 2)
    assert(out(0).getDouble(2) == 1.5 && out(1).isNullAt(2))
  }

  test("conform maps NUMERIC to decimal with declared precision") {
    import org.apache.spark.sql.types.DecimalType
    val df = Seq((1.23456, 2.5)).toDF("a", "b")
    val out = graft.etl.Etl.conform(df,
      Seq(ColumnSpec("a", "NUMERIC(10,2)"), ColumnSpec("b", "DECIMAL(5,1)")))
    assert(out.schema("a").dataType == DecimalType(10, 2))
    assert(out.schema("b").dataType == DecimalType(5, 1))
    val r = out.collect().head
    assert(r.getDecimal(0).toString == "1.23" && r.getDecimal(1).toString == "2.5")
  }

  test("writeTable lays out clustered, partitioned parquet") {
    val dir = tempDir("graft_write") + "/t"
    val df = Tables(spark, sfDir, "orders")
      .withColumn("yr", year(col("o_orderdate")))
    Sources.writeTable(df, dir, partitionCols = Seq("yr"),
      clusterKeys = Seq("o_orderkey"))
    val back = spark.read.parquet(dir)
    assert(back.count() == df.count())
    // partition pruning: reading one year touches only that directory
    val pruned = back.filter(col("yr") === 1995)
    val scanned = pruned.queryExecution.executedPlan.collectLeaves()
      .head.metrics.get("numFiles")
    assert(pruned.count() > 0)
  }

  test("bucketed tables join and aggregate with ZERO shuffle exchanges") {
    // The co-located-join layout claim from SURVEY §5 made executable:
    // both sides bucketed+sorted on the join key → SortMergeJoin reads
    // the buckets directly, and the same partitioning satisfies the
    // downstream groupBy — no Exchange anywhere in the executed plan.
    val wh = tempDir("graft_bucket")
    val o = Tables(spark, sfDir, "orders").select("o_orderkey", "o_totalprice")
    val l = Tables(spark, sfDir, "lineitem").select("l_orderkey", "l_quantity")
    o.write.mode("overwrite").option("path", s"$wh/o")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
    l.write.mode("overwrite").option("path", s"$wh/l")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the SMJ path: a broadcast join would hide the layout win
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("b_orders")
        .join(spark.table("b_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(sum(col("l_quantity")).as("qty"), sum(col("o_totalprice")).as("tp"))
      assert(j.collect().nonEmpty)
      val plan = j.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("stagePartitioned read prunes the scan to the filtered partition") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val staged = Sources.stagePartitioned(
      Tables(spark, sfDir, "events"), sfDir, "events", "event_type")
    val pruned = spark.read.parquet(staged)
      .filter(col("event_type") === "purchase")
    // static evidence: the predicate landed in partitionFilters (pruning
    // happens at planning, before any file is opened)
    val scan = pruned.queryExecution.executedPlan
      .collect { case f: FileSourceScanExec => f }.head
    assert(scan.partitionFilters.exists(_.toString.contains("event_type")))
    // dynamic evidence: the pruned scan reads strictly fewer files
    assert(pruned.collect().nonEmpty)
    val full = spark.read.parquet(staged)
    assert(full.collect().nonEmpty)
    val fullScan = full.queryExecution.executedPlan
      .collect { case f: FileSourceScanExec => f }.head
    assert(scan.metrics("numFiles").value < fullScan.metrics("numFiles").value)
  }

  test("misra_gries: candidate superset guarantee under overflow + distributed merge") {
    // zipf-ish stream over 40 distinct items with k=8 counters: the
    // sketch overflows constantly and partial buffers merge across 8
    // partitions — exactly the regime the guarantee must survive.
    // items: item i appears (41-i)*i? keep it simple: freq_i = 2^(12-i)
    // for i in 1..8 plus 32 rare items once each.
    val rows = (1 to 8).flatMap(i => Seq.fill(1 << (12 - i))(s"hh_$i")) ++
      (1 to 32).map(i => s"rare_$i")
    val n = rows.size
    val df = rows.map(Tuple1(_)).toDF("tok").repartition(8)
    val k = 8
    val sketch = df.agg(expr(s"misra_gries(tok, $k)").as("mg"))
      .select(explode(map_keys(col("mg"))).as("tok")).collect()
      .map(_.getString(0)).toSet
    assert(sketch.size <= k)
    // the guarantee: every item with true freq > n/(k+1) is present
    val truth = rows.groupBy(identity).view.mapValues(_.size)
    val mustHave = truth.filter(_._2 > n / (k + 1)).keySet
    assert(mustHave.nonEmpty && mustHave.subsetOf(sketch))
  }

  test("heavyHitters propose/verify equals exact groupBy-HAVING with a tight sketch") {
    // vocab (40) far exceeds the sketch (k=99 needed for perMille=10 ->
    // use 40-item vocab with k exactly at the guarantee bound)
    val rows = (1 to 8).flatMap(i => Seq.fill(200 * i)(s"top_$i word_$i")) ++
      (1 to 24).map(i => s"rare_$i")
    val df = rows.map(Tuple1(_)).toDF("text").repartition(8)
    val out = graft.text.Text.heavyHitters(df, perMille = 10, sketchK = 99)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = df.select(explode(graft.text.Text.tokens(col("text"))).as("tok"))
    val nTok = exact.count()
    val expected = exact.groupBy("tok").count()
      .filter(col("count") * 1000 > nTok * 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == expected)
    assert(out.nonEmpty && !out.contains("rare_1"))
  }

  test("jsonl.zst roundtrip: write shards, read by extension, schema applied") {
    import graft.sources.Sources
    import org.apache.spark.sql.types._
    val dir = tempDir("graft_zst")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val docs = Seq(
      (1L, "plain ascii line"),
      (2L, "unicode ü中文 and a\ttab"),
      (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    Sources.writeJsonlZst(docs.repartition(2), s"$dir/corpus")
    val shards = new java.io.File(s"$dir/corpus").listFiles()
      .filter(_.getName.endsWith(".zst"))
    assert(shards.length == 2, "one .zst shard per partition")
    // each shard really is zstd (magic 0xFD2FB528, little-endian)
    val magic = java.nio.file.Files.readAllBytes(shards.head.toPath).take(4)
    assert(magic.sameElements(Array(0x28, 0xB5, 0x2F, 0xFD).map(_.toByte)))
    val back = Sources.readJsonl(spark, s"$dir/corpus", schema)
    assert(back.schema == schema)
    assert(back.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      docs.collect().map(r => (r.getLong(0), r.getString(1))).toSet)
  }

  test("readJsonl: externally-produced zst + gz shards; quarantine catches malformed lines") {
    import graft.sources.Sources
    import org.apache.spark.sql.types._
    val dir = tempDir("graft_zst_ext")
    val lines = Seq(
      """{"doc_id": 1, "text": "good row one"}""",
      """this is not json at all""",
      """{"doc_id": 2, "text": "good row two"}""")
    // a shard produced by an external tool (raw zstd-jni stream, no
    // Spark involvement) — the crawl-ingest case
    val zout = new com.github.luben.zstd.ZstdOutputStream(
      new java.io.FileOutputStream(s"$dir/part-ext.jsonl.zst"))
    zout.write(lines.mkString("", "\n", "\n").getBytes("UTF-8")); zout.close()
    // and a gz sibling: the built-in extension path must keep working
    // after ZstdCodec.register restates the codec list
    val gout = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(s"$dir/part-ext2.jsonl.gz"))
    gout.write("""{"doc_id": 3, "text": "gz row"}""".getBytes("UTF-8"))
    gout.close()
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val back = Sources.readJsonl(spark, dir, schema, quarantine = true)
    val good = back.filter(col("_corrupt_record").isNull)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(good == Set((1L, "good row one"), (2L, "good row two"),
      (3L, "gz row")))
    val bad = back.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record")).collect().map(_.getString(0))
    assert(bad.toSeq == Seq("this is not json at all"))
  }

  test("ZstdCodec.register: the factory resolves .zst to graft's codec (conf-appended wins the extension map)") {
    // Hadoop 3.x prepends ServiceLoader-discovered codecs (including
    // Hadoop's own native-lib-requiring ZStandardCodec) and APPENDS the
    // conf list; the extension map is built in that order so the
    // appended entry wins .zst. That ordering is the load-bearing
    // assumption behind register() — pinned here.
    val conf = new org.apache.hadoop.conf.Configuration()
    graft.sources.ZstdCodec.register(conf)
    val factory =
      new org.apache.hadoop.io.compress.CompressionCodecFactory(conf)
    val codec = factory.getCodec(
      new org.apache.hadoop.fs.Path("/data/shard.jsonl.zst"))
    assert(codec != null, ".zst must resolve to a codec after register()")
    assert(codec.getClass == classOf[graft.sources.ZstdCodec],
      s".zst resolved to ${codec.getClass.getName}, not graft's ZstdCodec")
  }

  test("readJsonl: a zero-byte .zst shard reads as empty, not an error") {
    // crawl dumps contain empty shards (a fetch bucket with no pages);
    // an ingest that dies on one is not production-usable
    import graft.sources.Sources
    import org.apache.spark.sql.types._
    val dir = tempDir("graft_zst_empty")
    new java.io.FileOutputStream(s"$dir/empty.jsonl.zst").close()
    val f = new java.io.FileOutputStream(s"$dir/ok.jsonl.zst")
    f.write(com.github.luben.zstd.Zstd.compress(
      ("""{"doc_id": 1, "text": "beside the empty shard"}""" + "\n")
        .getBytes("UTF-8")))
    f.close()
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val back = Sources.readJsonl(spark, dir, schema)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(back.toSeq == Seq((1L, "beside the empty shard")))
  }

  test("readJsonl: a truncated zst shard fails LOUDLY, never silently drops data") {
    // the other corrupt-shard contract: a mid-frame cut (interrupted
    // upload) must surface as a task error a pipeline can alert on —
    // silent partial reads would be data loss disguised as success
    import graft.sources.Sources
    import org.apache.spark.sql.types._
    val dir = tempDir("graft_zst_trunc")
    val full = com.github.luben.zstd.Zstd.compress(
      (1 to 50).map(i => s"""{"doc_id": $i, "text": "row number $i"}""")
        .mkString("", "\n", "\n").getBytes("UTF-8"))
    val f = new java.io.FileOutputStream(s"$dir/cut.jsonl.zst")
    f.write(full, 0, full.length / 2) // mid-frame truncation
    f.close()
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val e = intercept[org.apache.spark.SparkException] {
      Sources.readJsonl(spark, dir, schema).count(): Unit
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(c => Option(c.getMessage).exists(m =>
        m.toLowerCase.contains("zstd") || m.toLowerCase.contains("truncated")
          || m.toLowerCase.contains("premature") || m.toLowerCase.contains("corrupt"))),
      s"expected a zstd/truncation error in the cause chain, got: " +
        chain(e).map(_.getMessage).mkString(" | "))
  }

  test("readJsonl: multi-frame zst shard (pzstd-style concatenation) reads every frame") {
    // parallel zstd tools emit one file = MANY concatenated frames; the
    // codec's input stream must keep reading past each frame boundary
    import graft.sources.Sources
    import org.apache.spark.sql.types._
    val dir = tempDir("graft_zst_mf")
    val f = new java.io.FileOutputStream(s"$dir/multi.jsonl.zst")
    for (frame <- Seq(
      """{"doc_id": 1, "text": "frame one"}""" + "\n",
      """{"doc_id": 2, "text": "frame two"}""" + "\n")) {
      // one complete frame per compress() call, appended to the same file —
      // exactly the byte layout pzstd produces (concatenated frames)
      f.write(com.github.luben.zstd.Zstd.compress(frame.getBytes("UTF-8")))
    }
    f.close()
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val back = Sources.readJsonl(spark, dir, schema)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(back == Set((1L, "frame one"), (2L, "frame two")))
  }

  test("Jdbc: partitioned parallel read, pushed-down filter, incremental " +
    "load, credential contract — against a real embedded database") {
    import graft.sources.Jdbc
    val dbDir = tempDir("graft_derby_spec")
    val conn = Jdbc.createDbConnection(s"jdbc:derby:$dbDir/db;create=true")
    val src = Tables(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderdate").cast("date").as("o_orderdate"))
    Jdbc.writeTable(src, conn, "orders_jdbc")
    // partitioned read: 8 key ranges = 8 RDD partitions, each its own
    // connection — the warehouse-pull shape that scales with executors
    val back = Jdbc.loadTableFromSql(spark, conn, "orders_jdbc",
      partitionCol = Some("o_orderkey"), numPartitions = 8)
    assert(back.rdd.getNumPartitions == 8)
    assert(back.count() == src.count())
    // value-lossless round trip
    val a = src.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getDouble(2), String.valueOf(r.getDate(3)))).toSet
    val b = back.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getDouble(2), String.valueOf(r.getDate(3)))).toSet
    assert(a == b)
    // filter pushdown: the predicate reaches the JDBCRelation scan
    // (the database does the selection, not Spark)
    val filtered = back.filter(col("o_custkey") === 370)
    val scanLine = filtered.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("JDBCRelation")).getOrElse("")
    assert(scanLine.contains("PushedFilters") &&
      scanLine.contains("o_custkey"), scanLine)
    assert(filtered.count() ==
      src.filter(col("o_custkey") === 370).count())
    // incremental load: archive < cutpoint from the DB (pushed down),
    // new batch >= cutpoint — equals the plain union re-derivation
    val cut = "1995-01-01"
    val newRows = src.filter(col("o_orderdate") >= cut)
      .withColumn("o_totalprice", col("o_totalprice") + 1.0)
    val inc = Jdbc.incrementalLoadJdbc(spark, conn, "orders_jdbc",
      newRows, "o_orderdate", cut, partitionCol = Some("o_orderkey"))
    assert(inc.count() == src.count())
    assert(inc.filter(col("o_orderdate") >= cut).count() == newRows.count())
    // credentials resolve through the provider at call time; a missing
    // key is a loud error, never an empty secret on the wire
    val creds = new graft.etl.StaticCredentials(Map("db_user" -> "app"))
    val c2 = Jdbc.createDbConnection("jdbc:derby:memory:x", userKey = Some("db_user"),
      credentials = creds)
    assert(c2.props.getProperty("user") == "app")
    intercept[RuntimeException] {
      Jdbc.createDbConnection("jdbc:derby:memory:x",
        passwordKey = Some("absent"), credentials = creds)
    }
  }

  test("Jdbc date split + predicate partitions + fetchsize: the " +
    "truncate_date shapes against a real embedded database") {
    import graft.sources.Jdbc
    val dbDir = tempDir("graft_derby_date")
    val conn = Jdbc.createDbConnection(s"jdbc:derby:$dbDir/db;create=true")
    val src = Tables(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderdate").cast("date").as("o_orderdate"))
    Jdbc.writeTable(src, conn, "orders_dt")
    val expect = src.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getDouble(2), String.valueOf(r.getDate(3)))).toSet

    // DATE-bounds discovery: one pushed-down min/max, string form
    val (lo, hi) = Jdbc.columnBoundsDate(spark, conn, "orders_dt",
      "o_orderdate")
    assert(lo < hi && lo.matches("""\d{4}-\d{2}-\d{2}"""), s"$lo..$hi")

    // date-keyed partitioned read: 6 date ranges = 6 RDD partitions,
    // value-identical to the source — the split must never change rows
    val byDate = Jdbc.loadTableFromSqlByDate(spark, conn, "orders_dt",
      partitionCol = "o_orderdate", numPartitions = 6)
    assert(byDate.rdd.getNumPartitions == 6)
    val gotDate = byDate.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getDouble(2), String.valueOf(r.getDate(3)))).toSet
    assert(gotDate == expect)
    // filters still push down through the date-split read
    val f = byDate.filter(col("o_custkey") === 370)
    val scanLine = f.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("JDBCRelation")).getOrElse("")
    assert(scanLine.contains("PushedFilters") &&
      scanLine.contains("o_custkey"), scanLine)

    // predicate-array read: truncate_date cutpoints -> disjoint +
    // covering ranges, one partition per predicate, NULLs in the first
    val cutCol = Jdbc.quoted(conn, "o_orderdate")
    val preds = Jdbc.datePredicates(cutCol,
      Seq("1994-01-01", "1996-01-01"))
    assert(preds.size == 3 && preds.head.contains("IS NULL"))
    val byPred = Jdbc.loadTableFromSqlPredicates(spark, conn, "orders_dt",
      preds)
    assert(byPred.rdd.getNumPartitions == 3)
    val gotPred = byPred.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getDouble(2), String.valueOf(r.getDate(3)))).toSet
    assert(gotPred == expect)

    // fetchsize reaches the reader as an option (the per-partition
    // row-batching knob; Derby accepts it silently — the assertion is
    // the read stays correct with a tiny batch that forces many
    // round trips)
    val small = Jdbc.loadTableFromSql(spark, conn, "orders_dt",
      partitionCol = Some("o_orderkey"), fetchSize = 7)
    assert(small.count() == expect.size)

    // unsorted/empty cutpoints are loud errors
    intercept[IllegalArgumentException] {
      Jdbc.datePredicates(cutCol, Seq("1996-01-01", "1994-01-01"))
    }
    intercept[IllegalArgumentException] {
      Jdbc.loadTableFromSqlPredicates(spark, conn, "orders_dt", Nil)
    }
  }
}
