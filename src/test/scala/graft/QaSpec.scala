package graft

import org.apache.spark.sql.functions._

import graft.qa.Qa

class QaSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    ("p1", Some(1.0), Some("a")),
    ("p1", None, Some("a")),
    ("p1", Some(3.0), Some("b")),
    ("p2", Some(5.0), None),
    ("p2", Some(7.0), Some("b"))
  ).toDF("period", "num", "cat")

  test("autocorrDaily: alternating volumes give exactly -1, constants " +
    "pin 0, degenerate series are null-safe") {
    def days(counts: Seq[Int]) = counts.zipWithIndex.flatMap {
      case (c, i) => Seq.fill(c)(f"2024-01-${i + 1}%02d")
    }.toDF("ds").select(to_date(col("ds")).as("d"))
    // counts 2,4,2,4 → pairs (2,4)(4,2)(2,4): n=3 sx=8 sy=10 sxy=24
    // sxx=24 syy=36 → r = (72-80)/sqrt(8·8) = -1 exactly
    val alt = Qa.autocorrDaily(days(Seq(2, 4, 2, 4)), "d").collect()(0)
    assert(alt.getAs[Long]("n_pairs") == 3L)
    assert(alt.getAs[Long]("sx") == 8L && alt.getAs[Long]("sy") == 10L)
    assert(alt.getAs[Long]("sxy") == 24L && alt.getAs[Long]("sxx") == 24L
      && alt.getAs[Long]("syy") == 36L)
    assert(alt.getAs[Double]("r_lag1") == -1.0)
    // rising trend co-moves: counts 1,2,3,4,5 → r = +1 exactly
    assert(Qa.autocorrDaily(days(Seq(1, 2, 3, 4, 5)), "d")
      .collect()(0).getAs[Double]("r_lag1") == 1.0)
    // constant series: zero variance → r pinned 0.0, not a div-by-zero
    assert(Qa.autocorrDaily(days(Seq(3, 3, 3)), "d")
      .collect()(0).getAs[Double]("r_lag1") == 0.0)
    // single day → no pairs; sums are SQL-null, r still pinned 0.0
    val one = Qa.autocorrDaily(days(Seq(5)), "d").collect()(0)
    assert(one.getAs[Long]("n_pairs") == 0L)
    assert(one.isNullAt(one.fieldIndex("sx")))
    assert(one.getAs[Double]("r_lag1") == 0.0)
    // null dates are excluded, not a day of their own
    val withNull = days(Seq(2, 4, 2, 4))
      .unionByName(Seq.fill(7)("x").toDF("s")
        .select(to_date(lit(null).cast("string")).as("d")))
    assert(Qa.autocorrDaily(withNull, "d")
      .collect()(0).getAs[Double]("r_lag1") == -1.0)
  }

  test("seasonalityDow: pure day arithmetic, zero-filled weekdays, " +
    "micro shares") {
    // 2024-01-01 was a Monday: dow 0. Three Mondays, one Tuesday,
    // one Sunday (2024-01-07).
    val df = Seq("2024-01-01", "2024-01-08", "2024-01-15", "2024-01-02",
      "2024-01-07").toDF("ds").select(to_date(col("ds")).as("d"))
    val out = Qa.seasonalityDow(df, "d").collect()
      .map(r => r.getAs[Int]("dow") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("share_micro"),
          r.getAs[Long]("dev_micro")))).toMap
    assert(out.size == 7)
    assert(out(0) == ((3L, 600000L, 600000L - 142857L)))
    assert(out(1) == ((1L, 200000L, 200000L - 142857L)))
    assert(out(6) == ((1L, 200000L, 200000L - 142857L)))
    assert(out(2) == ((0L, 0L, -142857L))) // zero-filled weekday
    // pre-epoch dates stay non-negative: 1969-12-31 was a Wednesday
    val pre = Qa.seasonalityDow(
      Seq("1969-12-31").toDF("ds").select(to_date(col("ds")).as("d")), "d")
      .collect().map(r => r.getAs[Int]("dow") -> r.getAs[Long]("n")).toMap
    assert(pre(2) == 1L)
  }

  test("missingness counts nulls and proportions per period/column") {
    val out = Qa.missingness(fixture, "period", Seq("num", "cat"))
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    assert(out(("p1", "num")) == ((1L, 0.3333)))
    assert(out(("p1", "cat")) == ((0L, 0.0)))
    assert(out(("p2", "cat")) == ((1L, 0.5)))
  }

  test("continuous computes mean/median/min/max ignoring nulls") {
    val out = Qa.continuous(fixture, "period", Seq("num"))
      .collect().map(r => (r.getString(0),
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(out("p1") == ((2.0, 2.0, 1.0, 3.0)))
    assert(out("p2") == ((6.0, 6.0, 5.0, 7.0)))
  }

  test("categorical includes NULL as a value row; proportions sum to 1") {
    val out = Qa.categorical(fixture, "period", Seq("cat"))
    val p2 = out.filter(col("period") === "p2").collect()
    assert(p2.exists(_.isNullAt(2))) // NULL category row present
    val sums = out.groupBy("period").agg(sum("proportion").as("s"))
      .collect().map(_.getDouble(1))
    sums.foreach(s => assert(math.abs(s - 1.0) < 1e-6))
  }

  test("approx quantiles track exact quantiles on real data") {
    // One pooled group: with ~1000 samples the sketch's nearest-value
    // answer sits within a tight band of the exact interpolated one.
    // (Per-tiny-group, interpolation-vs-nearest gaps dominate — that is
    // inherent to sketches, not an implementation bug.)
    val e = Tables(spark, sfDir, "events").withColumn("period", lit("all"))
    def p50(df: org.apache.spark.sql.DataFrame) =
      df.collect().head.getAs[Double]("p50")
    val exact = p50(Qa.quantiles(e, "period", Seq("value")))
    val approx = p50(Qa.quantilesApprox(e, "period", Seq("value")))
    assert(math.abs(exact - approx) < math.max(0.02 * math.abs(exact), 0.2),
      s"exact $exact vs approx $approx")
  }

  test("runPipeline classifies columns and produces every stat family") {
    val df = Seq(
      ("p1", 1.0, "a", java.sql.Timestamp.valueOf("2020-01-01 00:00:00")),
      ("p2", 2.0, "b", java.sql.Timestamp.valueOf("2020-02-01 00:00:00")))
      .toDF("period", "num", "cat", "when")
    val dir = tempDir("graft_qa")
    val out = Qa.runPipeline(df, "period", Seq("num", "cat", "when"),
      outDir = Some(dir))
    assert(out.keySet == Set("missing_data", "vals_continuous", "vals_date",
      "vals_categorical", "comparisons", "missing_changes",
      "categorical_changes"))
    assert(out("vals_continuous").collect().map(_.getString(1)).toSet == Set("num"))
    assert(out("vals_date").collect().map(_.getString(1)).toSet == Set("when"))
    assert(out("vals_categorical").collect().map(_.getString(1)).toSet == Set("cat"))
    // export step wrote parquet per family
    assert(spark.read.parquet(s"$dir/missing_data").count() == 6)
  }

  test("volumeAnomaly: 3σ integer rule, zero-variance flags any deviation, short windows excluded") {
    import java.sql.Timestamp
    // group "a": daily counts 2,2,2,2,3 — the first scored day (day 4,
    // window days 1-3: S1=6, S2=12, var=0) deviates by 0 → NOT flagged
    // (0 > 0 is false); day 5 (window days 2-4, still var=0) deviates
    // by 1 → flagged by the zero-variance any-deviation rule:
    // (3·3−6)² = 9 > 9·(3·12−36) = 0.
    // group "b": counts 1,3,2,2,6 — day 4 (S1=6, S2=14): (6−6)²=0 >
    // 9·(42−36)=54? no. day 5 (window 3,2,2: S1=7, S2=17):
    // (18−7)²=121 > 9·(51−49)=18 → flagged.
    // group "c": 3 days only → no scored rows (short window excluded).
    val counts = Map(
      ("a", 1) -> 2, ("a", 2) -> 2, ("a", 3) -> 2, ("a", 4) -> 2, ("a", 5) -> 3,
      ("b", 1) -> 1, ("b", 2) -> 3, ("b", 3) -> 2, ("b", 4) -> 2, ("b", 5) -> 6,
      ("c", 1) -> 1, ("c", 2) -> 1, ("c", 3) -> 1)
    val rows = counts.toSeq.flatMap { case ((g, d), n) =>
      (1 to n).map(i =>
        (g, Timestamp.valueOf(f"2024-01-$d%02d 10:0$i:00")))
    }
    val df = rows.toDF("grp", "ts")
    val out = Qa.volumeAnomaly(df, "grp", "ts", window = 3).collect()
      .map(r => (r.getString(0), r.getString(1).substring(8, 10).toInt,
        r.getLong(2), r.getInt(5))).toSet
    assert(out == Set(
      ("a", 4, 2L, 0), ("a", 5, 3L, 1),
      ("b", 4, 2L, 0), ("b", 5, 6L, 1)))
    // window_mean is S1/w rounded once from the raw ratio
    val means = Qa.volumeAnomaly(df, "grp", "ts", window = 3).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(4)).toMap
    assert(means(("b", "2024-01-04")) == 2.0)      // (1+3+2)/3
    assert(means(("b", "2024-01-05")) == 2.3333)   // (3+2+2)/3 rounded
  }

  test("comparePeriods flags relative mean change above threshold") {
    val longDf = Seq(("p1", "x", 100.0), ("p2", "x", 101.0), ("p3", "x", 110.0))
      .toDF("period", "varname", "mean")
    val out = Qa.comparePeriods(longDf, "period", relThreshold = 2.0)
      .collect().map(r => (r.getString(0), r.getInt(5))).toMap
    assert(out("p2") == 0) // 1% change, under threshold
    assert(out("p3") == 1) // ~8.9% change, flagged
  }

  test("comparePeriodsFull flags mean and median independently, signed") {
    val longDf = Seq(
      ("p1", "x", 100.0, 100.0), ("p2", "x", 101.0, 90.0), ("p3", "x", 97.0, 90.5))
      .toDF("period", "varname", "mean", "median")
    val rows = Qa.comparePeriodsFull(longDf, "period", relThreshold = 2.0)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(4), r.getInt(5), r.getDouble(8), r.getInt(9))).toMap
    // p2: mean +1% (no flag), median -10% (flag, signed negative)
    assert(rows("p2") == ((1.0, 0, -10.0, 1)))
    // p3: mean ~-3.96% (flag), median ~+0.56% (no flag)
    assert(rows("p3")._2 == 1 && rows("p3")._4 == 0)
    assert(rows("p3")._1 < 0) // signed, not absolute
  }

  test("missingnessChange flags percentage-point jumps in proportion") {
    val longDf = Seq(
      ("p1", "x", 0L, 0.01), ("p2", "x", 0L, 0.02), ("p3", "x", 0L, 0.10))
      .toDF("period", "varname", "n_missing", "proportion")
    val out = Qa.missingnessChange(longDf, "period", absThreshold = 3.0)
      .collect().map(r => (r.getString(0), (r.getDouble(4), r.getInt(5)))).toMap
    assert(out("p2") == ((1.0, 0))) // +1pp, under threshold
    assert(out("p3") == ((8.0, 1))) // +8pp, flagged
  }

  test("categoricalChange zero-fills the dense grid and flags disappearances") {
    val catLong = Seq(
      ("p1", "x", Some("a"), 8L, 0.8), ("p1", "x", Some("b"), 2L, 0.2),
      ("p2", "x", Some("a"), 10L, 1.0)) // value b disappears in p2
      .toDF("period", "varname", "value", "n", "proportion")
    val out = Qa.categoricalChange(catLong, "period", absThreshold = 3.0)
      .collect().map(r => (r.getString(0), r.getString(2)) ->
        (r.getLong(3), r.getDouble(4), r.getDouble(6), r.getInt(7))).toMap
    // b@p2 exists only via the template: zero-filled, -20pp, flagged
    assert(out(("p2", "b")) == ((0L, 0.0, -20.0, 1)))
    assert(out(("p2", "a")) == ((10L, 1.0, 20.0, 1)))
    assert(out.size == 2) // p1 rows have no previous period
  }

  test("categoricalTop8 keeps NULL + top-N dense ranks, collapses the rest") {
    // 10 distinct values with distinct counts + nulls, single period
    val rows = (1 to 10).flatMap(v => Seq.fill(v)(("p1", Some(s"v$v")))) ++
      Seq(("p1", None), ("p1", None))
    val df = rows.toDF("period", "cat")
    val out = Qa.categoricalTop8(df, "period", Seq("cat"), topN = 8)
    val byValue = out.collect()
      .map(r => Option(r.getString(2)).getOrElse("NULL") -> r.getLong(3)).toMap
    // v3..v10 are the top 8 dense ranks; v1+v2 collapse into Other values
    assert(byValue("Other values") == 3L) // 1 + 2
    assert(byValue("NULL") == 2L) // NULL always kept
    assert(byValue("v10") == 10L && byValue("v3") == 3L)
    assert(!byValue.contains("v2"))
    // proportions still sum to 1 after the collapse
    val s = out.agg(sum("proportion")).collect().head.getDouble(0)
    assert(math.abs(s - 1.0) < 1e-6)
  }

  test("runPipeline distinct_threshold routes low-cardinality numerics to categorical") {
    val df = Seq(
      ("p1", 1.0, 10.0), ("p1", 2.0, 10.0), ("p2", 3.0, 20.0), ("p2", 4.0, 20.0))
      .toDF("period", "hi_card", "lo_card")
    val out = Qa.runPipeline(df, "period", Seq("hi_card", "lo_card"),
      distinctThreshold = 3)
    // lo_card has 2 distinct values < 3 → categorical; hi_card stays numeric
    assert(out("vals_continuous").collect().map(_.getString(1)).toSet == Set("hi_card"))
    assert(out("vals_categorical").collect().map(_.getString(1)).toSet == Set("lo_card"))
  }

  test("fusedStats frames equal the standalone missingness/continuous/dates operators") {
    val e = Tables(spark, sfDir, "events")
      .withColumn("period", date_trunc("day", col("ts")).cast("date").cast("string"))
    val cols = Seq("event_type", "value", "props")
    val (miss, cont, dts) = Qa.fusedStats(e, "period", cols ++ Seq("ts"),
      Seq("value"), Seq("ts"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(miss) == rows(Qa.missingness(e, "period", cols ++ Seq("ts"))))
    assert(rows(cont.get) == rows(Qa.continuous(e, "period", Seq("value"))))
    assert(rows(dts.get) == rows(Qa.dates(e, "period", Seq("ts"))))
  }

  test("two-phase approx distinct routing equals the exact-only pass at the threshold boundary") {
    // columns engineered to sit exactly at, just below, just above, and far
    // from a distinct threshold of 10 — the exact-fallback band must make
    // the two-phase path route IDENTICALLY to a single exact pass
    val n = 200
    val df = (0 until n).map { i =>
      (i % 10,       // exactly at threshold
       i % 9,        // just below
       i % 11,       // just above
       i % 2,        // far below
       i)            // far above (200 distinct)
    }.toDF("at", "below", "above", "far_lo", "far_hi")
    val cols = Seq("at", "below", "above", "far_lo", "far_hi")
    for (t <- Seq(2, 9, 10, 11, 100)) {
      val twoPhase = Qa.routeDistinct(df, cols, t)
      val exact = Qa.routeDistinct(df, cols, t, exactOnly = true)
      assert(twoPhase == exact, s"threshold $t: $twoPhase != $exact")
    }
  }

  test("freshness flags sources past the SLA, exact staleness") {
    val df = Seq(
      ("a", java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
      ("a", java.sql.Timestamp.valueOf("2024-01-01 11:00:00")),
      ("b", java.sql.Timestamp.valueOf("2024-01-01 08:00:00")))
      .toDF("src", "ts")
    val asOf = graft.streaming.Streams.epochUs(
      java.sql.Timestamp.valueOf("2024-01-01 12:00:00"))
    val out = Qa.freshness(df, "src", "ts", asOf, slaUs = 2L * 3600 * 1000000)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("staleness_us"), r.getAs[Int]("stale"))).toMap
    assert(out("a") == ((3600L * 1000000, 0)))  // 1h fresh under a 2h SLA
    assert(out("b") == ((4L * 3600 * 1000000, 1))) // 4h stale
  }

  test("correlation: perfect linear pair hits ±1, hand-computed r and cov for the rest") {
    val df = Seq(
      (1.0, 2.0, 5.0), (2.0, 4.0, 1.0), (3.0, 6.0, 4.0), (4.0, 8.0, 2.0)
    ).toDF("x", "y", "z")
    val out = Qa.correlation(df, Seq(("x", "y"), ("x", "z")))
      .collect().map(r => (r.getAs[String]("x_var"), r.getAs[String]("y_var")) ->
        (r.getAs[Long]("n_rows"), r.getAs[Double]("corr"), r.getAs[Double]("cov"))).toMap
    val (n, rxy, cxy) = out(("x", "y"))
    assert(n == 4L)
    assert(rxy == 1.0) // y = 2x exactly
    // sample cov(x, 2x) = 2 * var(x) = 2 * (5/3)
    assert(math.abs(cxy - math.rint(2.0 * 5.0 / 3.0 * 1e6) / 1e6) < 1e-9)
    // hand-computed from the same formula: n=4, Sx=10, Sz=12, Sxx=30,
    // Szz=46, Sxz=27 -> r = (4*27-120)/(sqrt(4*30-100)*sqrt(4*46-144))
    val (_, rxz, cxz) = out(("x", "z"))
    val expR = (4.0 * 27 - 120) / (math.sqrt(20.0) * math.sqrt(40.0))
    assert(math.abs(rxz - math.rint(expR * 1e6) / 1e6) < 1e-9)
    assert(math.abs(cxz - math.rint((27.0 - 120.0 / 4) / 3.0 * 1e6) / 1e6) < 1e-9)
  }

  test("driftKs: hand-computed max ECDF distance, zero for identical, adjacency respected") {
    // day1 {1,2,3,4} vs day2 {3,4,5,6}: max |F1−F2| = 0.5 (at v=2 and 4)
    // day2 vs day3 {3,4,5,6}: identical → KS = 0
    val rows =
      Seq(1.0, 2.0, 3.0, 4.0).map(v => ("2024-01-01", v)) ++
      Seq(3.0, 4.0, 5.0, 6.0).map(v => ("2024-01-02", v)) ++
      Seq(3.0, 4.0, 5.0, 6.0).map(v => ("2024-01-03", v))
    val df = rows.toDF("period", "value")
    val out = Qa.driftKs(df, "period", "value").collect()
      .map(r => r.getString(0) -> (r.getAs[Double]("ks"),
        r.getAs[Long]("n_cur"), r.getAs[Long]("n_prev"))).toMap
    assert(out.size == 2) // day1 has no previous day
    assert(out("2024-01-02") == ((0.5, 4L, 4L)))
    assert(out("2024-01-03") == ((0.0, 4L, 4L)))
  }

  test("driftPsi: hand-computed shift, new/gone values counted not smoothed") {
    // p1: a=50 b=50; p2: a=80 b=20 c=10 (c is NEW in p2). PSI runs over
    // the common values {a, b} with period totals 100 and 110:
    // (80/110−0.5)·ln((80/110)/0.5) + (20/110−0.5)·ln((20/110)/0.5)
    val rows =
      Seq.fill(50)(("p1", "a")) ++ Seq.fill(50)(("p1", "b")) ++
      Seq.fill(80)(("p2", "a")) ++ Seq.fill(20)(("p2", "b")) ++
      Seq.fill(10)(("p2", "c"))
    val df = rows.toDF("period", "cat")
    val out = Qa.driftPsi(Qa.categorical(df, "period", Seq("cat")), "period")
      .collect()
    assert(out.length == 1) // only the p1→p2 transition
    val r = out.head
    assert(r.getString(0) == "p2")
    val pA = 80.0 / 110; val pB = 20.0 / 110
    val expected = (pA - 0.5) * math.log(pA / 0.5) +
      (pB - 0.5) * math.log(pB / 0.5)
    assert(math.abs(r.getAs[Double]("psi") - expected) < 1e-4)
    assert(r.getAs[Long]("n_common") == 2L)
    assert(r.getAs[Long]("n_new") == 1L)  // c appears in p2
    assert(r.getAs[Long]("n_gone") == 0L)
    // identical distributions → PSI 0 (floor quantization keeps ln(1)=0)
    val flat = (Seq.fill(30)(("p1", "x")) ++ Seq.fill(30)(("p2", "x")))
      .toDF("period", "cat")
    val psi0 = Qa.driftPsi(Qa.categorical(flat, "period", Seq("cat")), "period")
      .collect().head.getAs[Double]("psi")
    assert(psi0 == 0.0)
  }

  test("outliers: Tukey fences catch exactly the planted tails, fences dyadic-exact") {
    // 1..100 plus three planted extremes: n=103, sorted quartile indexes
    // (n-1)/4 = 25.5 and 76.5 → q1 = 25.5, q3 = 76.5, IQR = 51,
    // fences [-51, 153] — only the planted -60, 200, 1000 fall outside
    val vals = (1 to 100).map(_.toDouble) ++ Seq(-60.0, 200.0, 1000.0)
    val df = vals.map(v => ("p1", v)).toDF("period", "v")
    val out = Qa.outliers(df, "period", Seq("v")).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n") == 103L)
    assert(r.getAs[Long]("n_outliers") == 3L)
    // interpolated quartiles of scaled integers are dyadic → fences exact
    assert(r.getAs[Double]("fence_lo") == -51.0)
    assert(r.getAs[Double]("fence_hi") == 153.0)
  }

  test("workbookPivot lands each stat in its column, one row per cell group") {
    val long = Seq(
      ("vals_continuous", "p1", "v", None: Option[String], "mean", Some(1.5)),
      ("vals_continuous", "p1", "v", None: Option[String], "max", Some(2.5)),
      ("vals_categorical", "p1", "c", Some("x"), "n", Some(7.0)))
      .toDF("family", "period", "varname", "value", "stat", "val_num")
      .withColumn("val_str", lit(null).cast("string"))
    val out = Qa.workbookPivot(long)
    assert(Qa.workbookStats.forall(out.columns.contains))
    assert(out.count() == 2) // (continuous, p1, v) and (categorical, p1, c, x)
    val cont = out.filter(col("family") === "vals_continuous").collect().head
    assert(cont.getAs[Double]("mean") == 1.5 && cont.getAs[Double]("max") == 2.5)
    assert(cont.isNullAt(cont.fieldIndex("n_missing")))
    val cat = out.filter(col("family") === "vals_categorical").collect().head
    assert(cat.getAs[String]("value") == "x" && cat.getAs[Double]("n") == 7.0)
  }

  test("workbookSheets == workbookPivot(report(...)) on the gate's pipeline (collapse is value-exact)") {
    // the r9 collapse: the direct wide union must reproduce the
    // explode-then-pivot result row for row on real data covering every
    // family — including vals_date (its str stats produce long rows the
    // pivot groups away; `ts` exercises that merge), beyond the gate's
    // cols
    val e = Tables(spark, sfDir, "events")
      .withColumn("period",
        date_trunc("day", col("ts")).cast("date").cast("string"))
    val pipeline = Qa.runPipeline(e, "period",
      Seq("event_type", "value", "props", "ts"))
    val direct = Qa.workbookSheets(pipeline, "period")
    val pivoted = Qa.workbookPivot(Qa.report(pipeline, "period"))
    assert(direct.columns.toSeq == pivoted.columns.toSeq)
    assert(direct.count() == pivoted.count())
    assert(direct.exceptAll(pivoted).isEmpty &&
      pivoted.exceptAll(direct).isEmpty,
      "direct sheets and pivoted report must be multiset-identical")
  }

  test("writeXlsx emits a valid OOXML workbook: sheets, headers, numeric " +
    "and escaped string cells round-trip through a zip+DOM re-read") {
    import graft.qa.Workbook
    val s1 = Seq((1L, "plain", 2.5), (2L, "esc <&> \"q\"", 4.0))
      .toDF("id", "label", "score")
    val s2 = Seq(("x", 10)).toDF("k", "n")
    val path = tempDir("graft_xlsx") + "/report.xlsx"
    Workbook.writeXlsx(Seq("first" -> s1, "second[bad]:name" -> s2), path)
    // re-open as what it claims to be: a zip of OOXML parts
    val zf = new java.util.zip.ZipFile(path)
    try {
      val names = {
        val e = zf.entries(); val b = Seq.newBuilder[String]
        while (e.hasMoreElements) b += e.nextElement().getName
        b.result()
      }
      assert(names.contains("[Content_Types].xml"))
      assert(names.contains("xl/workbook.xml"))
      assert(names.contains("xl/worksheets/sheet1.xml"))
      assert(names.contains("xl/worksheets/sheet2.xml"))
      def xml(entry: String) = {
        val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
        f.setNamespaceAware(true)
        f.newDocumentBuilder().parse(zf.getInputStream(zf.getEntry(entry)))
      }
      // workbook part: both sheet names, the second sanitized
      val wb = xml("xl/workbook.xml")
      val sheetEls = wb.getElementsByTagNameNS("*", "sheet")
      val sheetNames = (0 until sheetEls.getLength).map(i =>
        sheetEls.item(i).getAttributes.getNamedItem("name").getNodeValue)
      assert(sheetNames == Seq("first", "second_bad__name"))
      // sheet 1: header row + 2 data rows; cells carry the right values
      val ws = xml("xl/worksheets/sheet1.xml")
      val rows = ws.getElementsByTagNameNS("*", "row")
      assert(rows.getLength == 3)
      def cells(r: Int): Map[String, String] = {
        val cs = rows.item(r).asInstanceOf[org.w3c.dom.Element]
          .getElementsByTagNameNS("*", "c")
        (0 until cs.getLength).map { i =>
          val c = cs.item(i).asInstanceOf[org.w3c.dom.Element]
          c.getAttribute("r") -> c.getTextContent
        }.toMap
      }
      assert(cells(0) == Map("A1" -> "id", "B1" -> "label", "C1" -> "score"))
      assert(cells(1)("A2") == "1" && cells(1)("B2") == "plain" &&
        cells(1)("C2") == "2.5")
      // the DOM re-read UNescapes — proving the writer escaped correctly
      assert(cells(2)("B3") == "esc <&> \"q\"")
      assert(cells(2)("C3") == "4") // integral double prints without .0
    } finally zf.close()
    // boundedness is enforced loudly, not by a driver OOM
    intercept[IllegalArgumentException] {
      Workbook.writeXlsx(Seq("s" -> s1), path, maxRows = 1)
    }
  }

  test("writeXlsx enforces maxRows WITHOUT materializing the frame: an " +
    "over-limit frame whose full collect would be enormous fails fast") {
    import graft.qa.Workbook
    // 2e9 rows: a full collect() would OOM any driver; limit(maxRows+1)
    // pushes into the scan so the guard costs maxRows+1 rows, proving
    // the loud-failure contract is enforced by the plan (VERDICT r14)
    val huge = spark.range(2000000000L).toDF("id")
    val path = tempDir("graft_xlsx_guard") + "/guard.xlsx"
    val start = System.nanoTime()
    val e = intercept[IllegalArgumentException] {
      Workbook.writeXlsx(Seq("big" -> huge), path, maxRows = 100)
    }
    assert(e.getMessage.contains("more than 100 rows"))
    // generous bound — the point is "seconds, not an OOM/minutes collect"
    assert((System.nanoTime() - start) / 1e9 < 30.0)
  }

  test("writeXlsx escapes quotes in sheet names and cell text: a name " +
    "with '\"' still yields well-formed workbook.xml") {
    import graft.qa.Workbook
    val s1 = Seq((1L, "has \"quotes\" & 'apos'")).toDF("id", "label")
    val path = tempDir("graft_xlsx_quote") + "/q.xlsx"
    Workbook.writeXlsx(Seq("she said \"hi\"" -> s1), path)
    val zf = new java.util.zip.ZipFile(path)
    try {
      val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      f.setNamespaceAware(true)
      // parse throws on malformed XML — the unescaped-quote failure mode
      val wb = f.newDocumentBuilder()
        .parse(zf.getInputStream(zf.getEntry("xl/workbook.xml")))
      val sheetEls = wb.getElementsByTagNameNS("*", "sheet")
      assert(sheetEls.item(0).getAttributes.getNamedItem("name")
        .getNodeValue == "she said \"hi\"")
      val ws = f.newDocumentBuilder()
        .parse(zf.getInputStream(zf.getEntry("xl/worksheets/sheet1.xml")))
      val cells = ws.getElementsByTagNameNS("*", "c")
      val texts = (0 until cells.getLength).map(cells.item(_).getTextContent)
      assert(texts.contains("has \"quotes\" & 'apos'"))
    } finally zf.close()
  }

  test("writeQaWorkbook renders the full pipeline: one tab per family " +
    "plus the unioned wide sheet") {
    import graft.qa.Workbook
    val df = Seq(
      ("p1", 1.0, "a", java.sql.Timestamp.valueOf("2020-01-01 00:00:00")),
      ("p2", 2.0, "b", java.sql.Timestamp.valueOf("2020-02-01 00:00:00")))
      .toDF("period", "num", "cat", "when")
    val pipeline = Qa.runPipeline(df, "period", Seq("num", "cat", "when"))
    val path = tempDir("graft_xlsx_qa") + "/qa.xlsx"
    Workbook.writeQaWorkbook(pipeline, "period", path)
    val zf = new java.util.zip.ZipFile(path)
    try {
      val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      f.setNamespaceAware(true)
      val wb = f.newDocumentBuilder()
        .parse(zf.getInputStream(zf.getEntry("xl/workbook.xml")))
      val sheetEls = wb.getElementsByTagNameNS("*", "sheet")
      val names = (0 until sheetEls.getLength).map(i =>
        sheetEls.item(i).getAttributes.getNamedItem("name").getNodeValue)
      assert(names.head == "workbook")
      assert(names.toSet == Set("workbook") ++ pipeline.keySet)
    } finally zf.close()
  }
}
