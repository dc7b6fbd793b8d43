package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.config.{ColumnSpec, TableConfig}
import graft.etl.Etl

class EtlSpec extends SparkSpec {
  import spark.implicits._

  test("conform casts declared types and pads missing columns with NULL") {
    val src = Seq((1L, "a", 2.5)).toDF("k", "s", "v")
    val vars = Seq(ColumnSpec("k", "INTEGER"), ColumnSpec("v", "VARCHAR(10)"),
      ColumnSpec("extra", "BIGINT"))
    val out = Etl.conform(src, vars)
    assert(out.schema.map(f => (f.name, f.dataType)) ==
      Seq(("k", IntegerType), ("v", StringType), ("extra", LongType)))
    val row = out.collect().head
    assert(row.getInt(0) == 1 && row.getString(1) == "2.5" && row.isNullAt(2))
  }

  test("combineYears unions by name, padding year-specific columns") {
    val y1 = Seq((1L, 10.0)).toDF("k", "v")
    val y2 = Seq((2L, 20.0, "x")).toDF("k", "v", "extra")
    val out = Etl.combineYears(Seq(y1, y2)).orderBy("k").collect()
    assert(out.length == 2)
    assert(out(0).isNullAt(2) && out(1).getString(2) == "x")
  }

  test("incrementalLoad splits archive/fresh at the cutpoint") {
    val archive = Seq(("2020-01-01", "old"), ("2020-06-01", "old"))
      .toDF("d", "src").withColumn("d", col("d").cast("date"))
    val fresh = Seq(("2020-01-01", "new"), ("2020-06-01", "new"))
      .toDF("d", "src").withColumn("d", col("d").cast("date"))
    val out = Etl.incrementalLoad(archive, fresh, "d", lit("2020-03-01"))
      .collect().map(r => (r.getDate(0).toString, r.getString(1))).toSet
    assert(out == Set(("2020-01-01", "old"), ("2020-06-01", "new")))
  }

  test("dedupKeepLatest keeps exactly one deterministic row per key") {
    val df = Seq((1, 2, "b"), (1, 3, "c"), (1, 1, "a"), (2, 9, "z"))
      .toDF("k", "ord", "v")
    val out = Etl.dedupKeepLatest(df, Seq("k"), Seq(col("ord").desc))
      .orderBy("k").collect()
    assert(out.map(_.getString(2)).toSeq == Seq("c", "z"))
  }

  test("tableDiff tags rows unique to each side") {
    val a = Seq(1, 2, 3).toDF("k")
    val b = Seq(2, 3, 4).toDF("k")
    val out = Etl.tableDiff(a, b).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(out == Set((1, "left_only"), (4, "right_only")))
  }

  test("tableDiff is null-safe: identical rows with NULLs are not diffs") {
    val a = Seq((1, Some("x")), (2, None), (3, None)).toDF("k", "v")
    val b = Seq((1, Some("x")), (2, None), (4, Option.empty[String])).toDF("k", "v")
    val out = Etl.tableDiff(a, b).collect()
      .map(r => (r.getInt(0), r.getString(2))).toSet
    // (2, NULL) matches itself on both sides; NULL-bearing uniques still diff
    assert(out == Set((3, "left_only"), (4, "right_only")))
  }

  test("sync converges both sides to the identical union, NULLs included") {
    val a = Seq((1, Some("x")), (2, None)).toDF("k", "v")
    val b = Seq((2, None), (3, Some("z"))).toDF("k", "v")
    val (sa, sb) = Etl.sync(a, b)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), Option(r.getString(1)))).toSet
    val expected = Set((1, Some("x")), (2, None), (3, Some("z")))
    assert(rows(sa) == expected)
    assert(rows(sb) == expected)
    // idempotent: a second sync is a no-op
    val (sa2, sb2) = Etl.sync(sa, sb)
    assert(rows(sa2) == expected && rows(sb2) == expected)
  }

  test("clusterBy preserves content and sorts within partitions") {
    val df = Tables(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_linenumber")
    val clustered = Etl.clusterBy(df, Seq("l_orderkey", "l_linenumber"))
    assert(clustered.count() == df.count())
    // every partition must be locally sorted by the cluster keys
    val violations = clustered.select("l_orderkey", "l_linenumber").rdd
      .mapPartitions { it =>
        val rows = it.map(r => (r.getLong(0), r.getInt(1))).toSeq
        Iterator.single(rows.zip(rows.drop(1)).count { case (x, y) =>
          x._1 > y._1 || (x._1 == y._1 && x._2 > y._2) })
      }.sum()
    assert(violations == 0.0)
  }

  test("copyInto stamps a deterministic batch id") {
    val out = Etl.copyInto(Seq(1).toDF("k"), "b1").collect().head
    assert(out.getString(1) == "b1")
  }

  test("hashSample is deterministic, engine-stable, and ~proportional") {
    val df = spark.range(10000).toDF("k")
    val s1 = graft.etl.Sampling.hashSample(df, "k", 0.3)
    val s2 = graft.etl.Sampling.hashSample(df.repartition(7), "k", 0.3)
    val k1 = s1.collect().map(_.getLong(0)).toSet
    assert(k1 == s2.collect().map(_.getLong(0)).toSet) // layout-independent
    assert(math.abs(k1.size / 10000.0 - 0.3) < 0.02)   // md5 is uniform
    // subset property: a smaller fraction is a subset of a larger one
    val k2 = graft.etl.Sampling.hashSample(df, "k", 0.1)
      .collect().map(_.getLong(0)).toSet
    assert(k2.subsetOf(k1))
  }

  test("stratifiedHashSample applies per-stratum rates") {
    val df = spark.range(6000).selectExpr("id as k",
      "CASE WHEN id % 3 = 0 THEN 'en' WHEN id % 3 = 1 THEN 'de' ELSE 'fr' END as lang")
    val out = graft.etl.Sampling.stratifiedHashSample(df, "lang", "k",
      Map("en" -> 0.2, "de" -> 1.0), defaultRate = 0.0)
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("de") == 2000L)                       // rate 1.0 keeps all
    assert(math.abs(byLang("en") - 400L) < 60)          // ~20% of 2000
    assert(!byLang.contains("fr"))                      // default 0 drops all
  }

  test("zorder layout narrows per-file min/max on BOTH columns; linear only on the first") {
    // two independent uniform dimensions; the written files' min/max
    // ranges are what parquet row-group skipping prunes with
    val df = spark.range(40000).selectExpr(
      s"cast(${graft.dedup.MinHashSpec.hpExpr(spark, "cast(id as string)")} % 1024 as long) as a",
      s"cast(${graft.dedup.MinHashSpec.hpExpr(spark, "cast(id + 999999 as string)")} % 1024 as long) as b")
    def avgSpan(dir: String, c: String): Double = {
      val spans = spark.read.parquet(dir)
        .groupBy(input_file_name()).agg((max(col(c)) - min(col(c))).as("s"))
        .collect().map(_.getLong(1).toDouble)
      spans.sum / spans.length / 1024.0
    }
    val tmp = tempDir("graft_zorder")
    // linear clustering on (a, b): 16 range partitions keyed by a
    df.repartitionByRange(16, col("a"), col("b"))
      .sortWithinPartitions("a", "b").write.parquet(s"$tmp/linear")
    // z-order: 16 range partitions of the interleaved key
    val zk = graft.etl.Etl.zorderKey(Seq(col("a"), col("b")), 10)
    df.withColumn("zk", zk).repartitionByRange(16, col("zk"))
      .sortWithinPartitions("zk").drop("zk").write.parquet(s"$tmp/zorder")
    val (linA, linB) = (avgSpan(s"$tmp/linear", "a"), avgSpan(s"$tmp/linear", "b"))
    val (zA, zB) = (avgSpan(s"$tmp/zorder", "a"), avgSpan(s"$tmp/zorder", "b"))
    // linear: a is tightly ranged (~1/16), b spans nearly everything
    assert(linA < 0.2 && linB > 0.8)
    // z-order: BOTH dimensions tile to a fraction of the domain (ideal
    // 1/4 for 16 tiles on a 2-d curve; range-partition boundaries cut
    // mid-tile, so allow up to 1/2) — the b-column span in particular
    // must collapse vs the linear layout, which is the whole point
    assert(zA < 0.5 && zB < 0.5, s"zorder spans a=$zA b=$zB")
    assert(zB < linB / 1.8, s"zorder b=$zB vs linear b=$linB")
  }

  test("groupSample: exact k per group, agg path equals window fallback") {
    val df = spark.range(3000).selectExpr("id as k",
      "CASE WHEN id % 3 = 0 THEN 'a' WHEN id % 3 = 1 THEN 'b' ELSE 'c' END as g")
      .repartition(7)
    val viaAgg = graft.etl.Sampling.groupSample(df, "g", "k", 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    // every group has exactly k rows, ranks 1..k
    assert(viaAgg.groupBy(_._1).forall { case (_, rows) =>
      rows.size == 10 && rows.map(_._3).toSet == (1 to 10).toSet })
    // the window formulation (the no-extension fallback) picks the
    // identical rows in the identical order
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("__b"), col("k"))
    val viaWindow = df
      .withColumn("__b", expr(
        graft.dedup.MinHashSpec.hpExpr(spark, "cast(k as string)") + " % 10000"))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 10)
      .select("g", "k", "rnk")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(viaAgg == viaWindow)
  }

  test("groupSample with a STRING key takes the window path and still returns exact k") {
    val df = spark.range(300).selectExpr("concat('key_', id) as k",
      "CASE WHEN id % 2 = 0 THEN 'x' ELSE 'y' END as g")
    val out = graft.etl.Sampling.groupSample(df, "g", "k", 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    // a bigint-tiebreak fast path would cast the string key to NULL and
    // silently return zero rows (self-review catch)
    assert(out.length == 10)
    assert(out.groupBy(_._1).forall(_._2.map(_._3).toSet == (1 to 5).toSet))
  }

  test("hashSplit covers every row once with ~weight proportions") {
    val df = spark.range(10000).toDF("k")
    val out = graft.etl.Sampling.hashSplit(df, "k",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 10000L) // partition of the data
    assert(math.abs(counts("train") - 8000L) < 200)
    assert(math.abs(counts("val") - 1000L) < 120)
    // deterministic: same assignment on rerun
    val a1 = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val a2 = graft.etl.Sampling.hashSplit(df.repartition(5), "k",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a1 == a2)
  }

  test("mixRebalance hits target proportions without upsampling") {
    // skewed corpus: a=6000, b=3000, c=1000, d=2000; target 50/30/20
    // over a/b/c → c is the bottleneck (1000/0.2 = 5000 feasible), so
    // expected keeps ≈ 2500 a, 1500 b, ALL 1000 c; d is dropped.
    val df = spark.range(12000).selectExpr("id as k",
      """CASE WHEN id < 6000 THEN 'a' WHEN id < 9000 THEN 'b'
              WHEN id < 10000 THEN 'c' ELSE 'd' END as src""")
    val out = graft.etl.Sampling.mixRebalance(df, "src", "k",
      Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2))
    val bySrc = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("c") == 1000L)                    // bottleneck keeps all
    assert(math.abs(bySrc("a") - 2500L) < 150)
    assert(math.abs(bySrc("b") - 1500L) < 120)
    assert(!bySrc.contains("d"))                   // not in targets
    // deterministic under re-partitioning
    val k1 = out.select("k").collect().map(_.getLong(0)).toSet
    val k2 = graft.etl.Sampling.mixRebalance(df.repartition(7), "src", "k",
      Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2))
      .select("k").collect().map(_.getLong(0)).toSet
    assert(k1 == k2)
  }

  test("upsampleEpochs: exact integer epochs, hash-deterministic fractional copy, drop and pass-through") {
    val df = spark.range(8000).selectExpr("id as k",
      """CASE WHEN id < 2000 THEN 'a' WHEN id < 4000 THEN 'b'
              WHEN id < 6000 THEN 'c' ELSE 'd' END as src""")
    val out = graft.etl.Sampling.upsampleEpochs(df, "src", "k",
      Map("a" -> 3.0, "b" -> 2.5, "c" -> 0.3))
    val rows = out.select("src", "k", "epoch").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val copies = rows.groupBy(t => (t._1, t._2)).map { case (sk, rs) =>
      // epochs are contiguous 1..copies per row
      assert(rs.map(_._3).sorted.toSeq == (1 to rs.length))
      sk -> rs.length
    }
    // r=3.0: every 'a' row exactly 3 times
    assert(copies.filter(_._1._1 == "a").values.toSet == Set(3))
    assert(copies.count(_._1._1 == "a") == 2000)
    // r=2.5: 2 or 3 copies, and the 3-copy rows are EXACTLY the rows
    // hashSample at the fractional part would keep
    val b3 = copies.collect { case (("b", k), 3) => k }.toSet
    assert(copies.filter(_._1._1 == "b").values.toSet == Set(2, 3))
    val half = graft.etl.Sampling.hashSample(
        df.filter(col("src") === "b"), "k", 0.5)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(b3 == half)
    // r=0.3 degrades to plain downsampling (same rows as hashSample)
    val cKeep = copies.collect { case (("c", k), n) => assert(n == 1); k }.toSet
    val cSample = graft.etl.Sampling.hashSample(
        df.filter(col("src") === "c"), "k", 0.3)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(cKeep == cSample)
    // default 1.0: unlisted source passes through exactly once
    assert(copies.count(_._1._1 == "d") == 2000)
    assert(copies.filter(_._1._1 == "d").values.toSet == Set(1))
    // r=0.0 drops a source entirely
    val dropped = graft.etl.Sampling.upsampleEpochs(df, "src", "k",
      Map("a" -> 0.0)).filter(col("src") === "a").count()
    assert(dropped == 0L)
  }

  test("tokenBudget takes docs in hash order until the source budget") {
    val df = Seq(
      (1L, "s", "t1 t2 t3"), (2L, "s", "t1 t2 t3"), (3L, "s", "t1 t2 t3"),
      (4L, "u", "t1 t2 t3 t4 t5 t6 t7")).toDF("doc_id", "src", "text")
    val out = graft.etl.Sampling.tokenBudget(df, "src", "doc_id", "text",
      budget = 7L).collect()
      .map(r => r.getLong(0) -> r.getInt(3)).toMap
    // source s: 3-token docs, budget 7 → exactly 2 docs (cum 3, 6, 9)
    assert(out.count(_._1 <= 3L) == 2)
    // source u: single 7-token doc fits exactly
    assert(out(4L) == 7)
    assert(out.values.forall(_ > 0))
  }

  test("checkVersion compares dotted versions") {
    assert(Etl.checkVersion("2.2.0", "2.2.0")._1)
    assert(Etl.checkVersion("2.3.0", "2.2.9")._1)
    assert(!Etl.checkVersion("2.2.0", "2.10.0")._1) // numeric, not lexicographic
    assert(!Etl.checkVersion("1.9", "2.0.1")._1)
  }

  test("copyInto row id is content-derived: stable across partition layouts") {
    val df = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
    def ids(d: org.apache.spark.sql.DataFrame) =
      Etl.copyInto(d, "b1", idCols = Seq("k", "v"))
        .collect().map(r => r.getInt(0) -> r.getLong(3)).toMap
    val one = ids(df.coalesce(1))
    val many = ids(df.repartition(3))
    assert(one == many) // monotonically_increasing_id would differ here
  }

  test("csv round-trip: custom delimiter + header skip with explicit schema") {
    val dir = tempDir("graft_csv")
    val src = Tables(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
      .limit(500)
    src.coalesce(1).write.mode("overwrite")
      .option("header", "true").option("sep", "|").csv(dir)
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType), StructField("l_returnflag", StringType)))
    val back = spark.read.schema(schema)
      .option("header", "true").option("sep", "|").csv(dir)
    assert(back.count() == 500)
    assert(back.exceptAll(src).count() == 0 && src.exceptAll(back).count() == 0)
  }

  test("dedupKeepLatestByMax matches the window variant") {
    val df = Tables(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")
    val viaWindow = Etl.dedupKeepLatest(df, Seq("l_orderkey"),
      Seq(col("l_shipdate").desc, col("l_linenumber").desc, col("l_quantity").desc))
    val viaMax = Etl.dedupKeepLatestByMax(df, Seq("l_orderkey"),
      Seq("l_shipdate", "l_linenumber", "l_quantity"))
    assert(viaWindow.count() == viaMax.count())
    assert(viaWindow.exceptAll(viaMax).count() == 0)
  }

  test("upsert: updates replace target rows by key, new keys append") {
    val target = Seq((1L, "old", 1), (2L, "keep", 1)).toDF("k", "v", "ver")
    val updates = Seq((1L, "new", 2), (3L, "add", 1)).toDF("k", "v", "ver")
    val out = Etl.upsert(target, updates, Seq("k"), Seq("ver"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((1L, "new"), (2L, "keep"), (3L, "add")))
  }

  test("upsert: same-version update wins over target (source rank)") {
    val target = Seq((1L, "old", 1)).toDF("k", "v", "ver")
    val updates = Seq((1L, "new", 1)).toDF("k", "v", "ver")
    val out = Etl.upsert(target, updates, Seq("k"), Seq("ver")).collect()
    assert(out.head.getString(1) == "new")
  }

  test("config-driven pipeline: load → conform → dedup → qa → write") {
    val dir = tempDir("graft_pipe")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/in.csv"),
      "id,period,v\n1,p1,10\n1,p1,20\n2,p2,30\n")
    val cfg = TableConfig(
      toTable = "t",
      vars = Seq(ColumnSpec("id", "BIGINT"), ColumnSpec("period", "VARCHAR(4)"),
        ColumnSpec("v", "FLOAT")),
      filePath = Map("overall" -> s"$dir/in.csv"),
      fieldTerm = Map("overall" -> ","),
      indexVars = Seq("id"))
    val res = graft.etl.Pipeline.run(spark, cfg,
      dedupKeys = Seq("id"), dedupOrder = Seq("v"),
      qaTimeVar = Some("period"), outPath = Some(s"$dir/out"))
    assert(res.rowCount == 2) // id=1 deduped to the v=20 row
    assert(res.table.filter(col("id") === 1).collect().head.getDouble(2) == 20.0)
    assert(res.qa.contains("missing_data") && res.qa.contains("vals_continuous"))
    assert(spark.read.parquet(s"$dir/out").count() == 2)
  }

  test("pipeline optional stages: validation audit + quarantine + freshness SLA") {
    val dir = tempDir("graft_pipe3")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/in.csv"),
      // ids 2 and 3 violate v_positive (-5, 0); id=1 is a dup whose
      // INVALID copy has the larger v and would win keep-latest if the
      // quarantine ran after dedup instead of before
      "id,ts,v\n" +
        "1,2024-01-01 10:00:00,10\n" +
        "1,2024-01-01 11:00:00,-99\n" +
        "2,2024-01-01 09:00:00,-5\n" +
        "3,2024-01-02 12:00:00,0\n" +
        "4,2024-01-02 23:30:00,40\n")
    val cfg = TableConfig(
      toTable = "t",
      vars = Seq(ColumnSpec("id", "BIGINT"), ColumnSpec("ts", "DATETIME"),
        ColumnSpec("v", "FLOAT")),
      filePath = Map("overall" -> s"$dir/in.csv"),
      fieldTerm = Map("overall" -> ","))
    // as-of 2024-01-03T00:00:00Z; 2h SLA -> id groups whose last event
    // is older than 22:00 on Jan 2 are stale
    val asOf = java.time.Instant.parse("2024-01-03T00:00:00Z")
      .toEpochMilli * 1000L
    val res = graft.etl.Pipeline.run(spark, cfg,
      dedupKeys = Seq("id"), dedupOrder = Seq("v"),
      validationRules = Seq("v_positive" -> (col("v") > 0)),
      quarantineInvalid = true,
      freshnessSla = Some(graft.etl.Pipeline.FreshnessSla(
        "id", "ts", asOf, 2L * 3600 * 1000000)))
    // audit reports the RAW load: 5 rows checked, 3 violations
    val v = res.validation.get.collect().head
    assert(v.getString(0) == "v_positive")
    assert(v.getLong(1) == 3 && v.getLong(2) == 5)
    // quarantine ran BEFORE dedup: id=1 keeps the valid v=10 row (the
    // invalid v=-99 copy did not win keep-latest); ids 2 and 3 are gone
    assert(res.rowCount == 2)
    assert(res.table.filter(col("id") === 1).collect().head.getDouble(2) == 10.0)
    assert(res.table.filter(col("id").isin(2, 3)).count() == 0)
    // freshness is computed on the written frame: id=4 (23:30, 30 min
    // lag) is fresh; ids 1 (Jan 1) is stale
    val fr = res.freshness.get.collect()
      .map(r => r.getLong(0) -> r.getInt(4)).toMap
    assert(fr == Map(1L -> 1, 4L -> 0))
  }

  test("pipeline clusterLater: bulk-write unclustered, then rebuild layout") {
    val dir = tempDir("graft_pipe2")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/in.csv"),
      "id,v\n3,30\n1,10\n2,20\n")
    val cfg = TableConfig(
      toTable = "t",
      vars = Seq(ColumnSpec("id", "BIGINT"), ColumnSpec("v", "FLOAT")),
      filePath = Map("overall" -> s"$dir/in.csv"),
      fieldTerm = Map("overall" -> ","),
      indexVars = Seq("id"))
    val res = graft.etl.Pipeline.run(spark, cfg,
      outPath = Some(s"$dir/out"), clusterLater = true)
    assert(res.rowCount == 3)
    val back = spark.read.parquet(s"$dir/out")
    assert(back.count() == 3)
    assert(back.orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(!new java.io.File(s"$dir/out__reclustered").exists())
  }

  test("ParquetNotifySink: dispatches land as audit-table rows with the " +
    "rendered text; appends accumulate across sink instances") {
    import graft.etl.{Notifier, ParquetNotifySink}
    val path = tempDir("graft_notify") + "/audit"
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 08:00:00")
    val sink = new ParquetNotifySink(spark, path, clock = () => t0)
    val n = new Notifier(Map(
      "load_done" -> "Loaded {table} ({rows} rows)",
      "qa_fail" -> "QA failed on {table}: {rule}"), sink)
    n.send("load_done", Map("table" -> "claims", "rows" -> "42"))
    n.send("qa_fail", Map("table" -> "claims", "rule" -> "v_positive"))
    // a SECOND sink instance appends to the same table (the production
    // shape: one table, many pipeline runs)
    val n2 = new Notifier(Map("load_done" -> "Loaded {table} ({rows} rows)"),
      new ParquetNotifySink(spark, path, clock = () => t0))
    n2.send("load_done", Map("table" -> "rx", "rows" -> "7"))
    val back = graft.etl.ParquetNotifySink.read(spark, path)
    assert(back.count() == 3)
    assert(back.columns.toSet ==
      Set("msg_name", "vars", "rendered", "sent_at"))
    val rows = back.collect().map(r =>
      (r.getAs[String]("msg_name"), r.getAs[String]("rendered"))).toSet
    assert(rows == Set(
      ("load_done", "Loaded claims (42 rows)"),
      ("qa_fail", "QA failed on claims: v_positive"),
      ("load_done", "Loaded rx (7 rows)")))
    // vars survive as a queryable map column
    assert(back.filter(col("vars")("table") === "claims").count() == 2)
    // unknown template still fails fast, nothing appended
    intercept[RuntimeException] { n.send("nope", Map.empty) }
    assert(graft.etl.ParquetNotifySink.read(spark, path).count() == 3)
  }

  test("pipeline xlsxPath hook: load → conform → QA → one .xlsx on disk " +
    "in a single run() call") {
    val dir = tempDir("graft_pipe_xlsx")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/in.csv"),
      "id,period,v\n1,p1,10\n2,p1,20\n3,p2,30\n")
    val cfg = TableConfig(
      toTable = "t",
      vars = Seq(ColumnSpec("id", "BIGINT"), ColumnSpec("period", "VARCHAR(4)"),
        ColumnSpec("v", "FLOAT")),
      filePath = Map("overall" -> s"$dir/in.csv"),
      fieldTerm = Map("overall" -> ","))
    val res = graft.etl.Pipeline.run(spark, cfg,
      qaTimeVar = Some("period"), outPath = Some(s"$dir/out"),
      xlsxPath = Some(s"$dir/qa.xlsx"))
    assert(res.rowCount == 3)
    // the workbook exists, re-reads as OOXML, and carries one tab per
    // QA family plus the unioned wide sheet first
    val zf = new java.util.zip.ZipFile(s"$dir/qa.xlsx")
    try {
      val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      f.setNamespaceAware(true)
      val wb = f.newDocumentBuilder()
        .parse(zf.getInputStream(zf.getEntry("xl/workbook.xml")))
      val sheetEls = wb.getElementsByTagNameNS("*", "sheet")
      val names = (0 until sheetEls.getLength).map(i =>
        sheetEls.item(i).getAttributes.getNamedItem("name").getNodeValue)
      assert(names.head == "workbook")
      assert(names.toSet == Set("workbook") ++ res.qa.keySet)
    } finally zf.close()
    // xlsxPath without a QA stage is a loud error, not a silent no-op
    intercept[RuntimeException] {
      graft.etl.Pipeline.run(spark, cfg, xlsxPath = Some(s"$dir/q2.xlsx"))
    }
  }

  test("schemaDiff reports match / mismatch / one-sided columns") {
    val a = Seq((1L, "x", 1.0)).toDF("id", "name", "amt")
    val b = Seq((1, "x", true)).toDF("id", "name", "active")
    val out = Etl.schemaDiff(spark, a, b).collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    assert(out == Map("id" -> "type_mismatch", "name" -> "match",
      "amt" -> "left_only", "active" -> "right_only"))
  }

  test("createTableDdl emits parquet DDL from a config") {
    val ddl = Etl.createTableDdl("raw", "t",
      Seq(ColumnSpec("id", "BIGINT"), ColumnSpec("name", "VARCHAR(10)")),
      Some("/data/t"))
    assert(ddl.contains("CREATE TABLE raw.t"))
    assert(ddl.contains("id BIGINT") && ddl.contains("name STRING"))
    assert(ddl.contains("LOCATION '/data/t'"))
  }

  test("dropTablesWithSuffix removes only matching temp views") {
    Seq(1).toDF("x").createOrReplaceTempView("keep_me")
    Seq(1).toDF("x").createOrReplaceTempView("t1_copy")
    Seq(1).toDF("x").createOrReplaceTempView("t2_copy")
    val dropped = Etl.dropTablesWithSuffix(spark, "_copy")
    assert(dropped.toSet == Set("t1_copy", "t2_copy"))
    assert(spark.catalog.tableExists("keep_me"))
    assert(!spark.catalog.tableExists("t1_copy"))
  }

  test("yaml-subset config parser honors the reference contract") {
    val cfg = TableConfig.fromYaml(
      """to_schema: raw
        |to_table: mcaid_elig
        |first_row: 2
        |vars:
        |    id: BIGINT
        |    name: VARCHAR(64)
        |years:
        |    2014
        |    2015
        |vars_2014:
        |    legacy_flag: INTEGER
        |""".stripMargin)
    assert(cfg.toTable == "mcaid_elig" && cfg.toSchema == "raw")
    assert(cfg.vars.map(_.name).toSet == Set("id", "name"))
    assert(cfg.years == Seq(2014, 2015))
    assert(cfg.varsForYear(2014).map(_.name).contains("legacy_flag"))
    assert(cfg.allVars.map(_.name).distinct.size == cfg.allVars.size)
  }

  test("scd2 collapses runs into validity intervals, null-safe") {
    val changes = Seq(
      (1L, Some("a"), 1L), (1L, Some("a"), 2L), (1L, Some("b"), 3L),
      (1L, Some("a"), 4L),
      (2L, None: Option[String], 1L), (2L, None: Option[String], 2L),
      (2L, Some("x"), 3L)).toDF("k", "state", "ts")
    val out = Etl.scd2(changes, Seq("k"), Seq("state"), "ts")
      .select("k", "state", "valid_from", "valid_to", "is_current")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long]),
        r.getInt(4))).toSet
    assert(out == Set(
      (1L, Some("a"), 1L, Some(3L), 0),
      (1L, Some("b"), 3L, Some(4L), 0),
      (1L, Some("a"), 4L, None, 1),
      // the NULL run collapses like a value (null-safe <=>), not into
      // per-row intervals
      (2L, None, 1L, Some(3L), 0),
      (2L, Some("x"), 3L, None, 1)))
  }

  test("groupingSetsAgg emits exactly the three asked-for groupings") {
    val out = graft.analytics.Queries.groupingSetsAgg(spark, sfDir)
    val both = out.filter(col("event_type").isNotNull && col("day").isNotNull)
    val byType = out.filter(col("event_type").isNotNull && col("day").isNull)
    val byDay = out.filter(col("event_type").isNull && col("day").isNotNull)
    val grand = out.filter(col("event_type").isNull && col("day").isNull)
    val e = Tables(spark, sfDir, "events")
    assert(grand.count() == 0) // NOT a cube: no grand total
    assert(byType.count() == e.select("event_type").distinct().count())
    assert(byDay.count() ==
      e.select(date_trunc("day", col("ts"))).distinct().count())
    assert(both.count() + byType.count() + byDay.count() == out.count())
  }

  test("jsonExtract: malformed and key-missing props become NULLs, counted apart") {
    val dir = tempDir("graft_json")
    Seq(
      (1L, """{"k": 5}"""), (2L, """{"k": 7}"""),
      (3L, """{"x": 1}"""),   // key missing
      (4L, "not json"),       // malformed
      (5L, null: String))     // null payload
      .toDF("event_id", "props")
      .withColumn("ts", lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .withColumn("user_id", lit(1L))
      .withColumn("event_type", lit("x")).withColumn("value", lit(1.0))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.analytics.Queries.jsonExtract(spark, dir).collect().head
    assert(r.getAs[Long]("n") == 5L)
    assert(r.getAs[Long]("n_with_k") == 2L) // only the two real k values
    assert(r.getAs[Long]("sum_k") == 12L)
    assert(r.getAs[Int]("min_k") == 5 && r.getAs[Int]("max_k") == 7)
  }

  test("histogram: exact bin edges, clamp at hi, empty bins zero-filled") {
    val dir = tempDir("graft_hist")
    // values 0..10: lo=0, hi=10, width=0.5 over 20 bins; v=10 clamps to 19
    (0 to 10).map(i => (i.toLong, i.toDouble)).toDF("event_id", "value")
      .withColumn("ts", lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .withColumn("user_id", lit(1L))
      .withColumn("event_type", lit("x")).withColumn("props", lit("p"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.analytics.Queries.histogram(spark, dir).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out.size == 20)                       // every bin present
    assert(out(0) == 1L && out(2) == 1L)         // 0 → bin 0, 1 → bin 2
    assert(out(19) == 1L)                        // v = hi clamped inside
    assert(out(1) == 0L)                         // empty bin zero-filled
    assert(out.values.sum == 11L)                // nothing lost
  }

  test("pkCheck: unique key reports zero dups, duplicated key exact multiplicities") {
    val df = Seq((1L, 1), (1L, 2), (2L, 1), (2L, 1), (2L, 1), (3L, 9))
      .toDF("a", "b")
    val unique = Etl.pkCheck(df, Seq("a", "b"), "ab").collect().head
    assert(unique.getAs[Long]("n_rows") == 6L)
    assert(unique.getAs[Long]("n_keys") == 4L)     // (2,1)x3 collapses to one
    assert(unique.getAs[Long]("n_dup_keys") == 1L)
    assert(unique.getAs[Long]("n_rows_in_dups") == 3L)
    assert(unique.getAs[Long]("max_multiplicity") == 3L)
    val bare = Etl.pkCheck(df, Seq("a"), "a").collect().head
    assert(bare.getAs[Long]("n_keys") == 3L)
    assert(bare.getAs[Long]("n_dup_keys") == 2L)   // keys 1 and 2
    assert(bare.getAs[Long]("n_rows_in_dups") == 5L)
  }

  test("fkCoverage counts planted orphans and unreferenced dim rows") {
    val dim = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val fact = Seq((10L, 1L), (11L, 1L), (12L, 2L), (13L, 99L)) // 99 = orphan
      .toDF("id", "fk")
    val r = Etl.fkCoverage(fact, dim, "fk", "k", "t").collect().head
    assert(r.getString(0) == "t")
    assert(r.getLong(1) == 4L)  // n_fact
    assert(r.getLong(2) == 1L)  // the planted orphan
    assert(r.getLong(3) == 3L)  // n_dim
    assert(r.getLong(4) == 1L)  // dim row 3 unreferenced
  }

  test("rollingActiveUsers: trailing-window distinct, not a sum of DAUs") {
    // user 1 active on days 1 AND 2 — a naive DAU sum over the window
    // would double-count them; the distinct-over-window must not
    val dir = tempDir("graft_rau")
    Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L),
      (2L, java.sql.Timestamp.valueOf("2024-01-02 10:00:00"), 1L),
      (3L, java.sql.Timestamp.valueOf("2024-01-02 11:00:00"), 2L),
      (4L, java.sql.Timestamp.valueOf("2024-01-20 10:00:00"), 3L))
      .toDF("event_id", "ts", "user_id")
      .withColumn("event_type", lit("x"))
      .withColumn("value", lit(1.0)).withColumn("props", lit("p"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.analytics.Queries.rollingActiveUsers(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(out("2024-01-01") == ((1L, 1L)))
    assert(out("2024-01-02") == ((2L, 2L))) // users {1,2}, NOT 1+2=3
    assert(out("2024-01-20") == ((1L, 1L))) // window slid past days 1-2
  }

  test("temperatureMix boosts the low-resource stratum, no upsampling") {
    // a=10000, b=100; α=0.5 → w=(100,10), min(n/w)=10 → rates a=0.1, b=1.0
    val df = spark.range(10100).selectExpr("id as k",
      "CASE WHEN id < 10000 THEN 'a' ELSE 'b' END as src")
    val out = graft.etl.Sampling.temperatureMix(df, "src", "k")
    val bySrc = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("b") == 100L)                 // low-resource keeps all
    assert(math.abs(bySrc("a") - 1000L) < 100) // dominant thinned to w-share
    // deterministic under physical layout
    val k1 = out.select("k").collect().map(_.getLong(0)).toSet
    val k2 = graft.etl.Sampling.temperatureMix(df.repartition(5), "src", "k")
      .select("k").collect().map(_.getLong(0)).toSet
    assert(k1 == k2)
  }

  test("shuffleShards: contiguous positions, layout-independent, append-stable order") {
    val df = spark.range(500).selectExpr("id as k", "cast(id % 3 as string) as tag")
    val out = graft.etl.Sampling.shuffleShards(df, "k", nShards = 8).collect()
    assert(out.length == 500)
    // every shard's positions are exactly 1..count
    out.groupBy(_.getAs[Int]("shard")).values.foreach { rs =>
      val ps = rs.map(_.getAs[Int]("pos")).sorted.toSeq
      assert(ps == (1 to rs.length))
    }
    // genuinely shuffled: within-shard key order differs from source order
    val someShard = out.groupBy(_.getAs[Int]("shard")).values.maxBy(_.length)
    val keysByPos = someShard.sortBy(_.getAs[Int]("pos")).map(_.getAs[Long]("k")).toSeq
    assert(keysByPos != keysByPos.sorted)
    // deterministic under physical layout
    val out2 = graft.etl.Sampling.shuffleShards(df.repartition(7), "k", nShards = 8)
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Int]("shard"), r.getAs[Int]("pos"))).toSet
    assert(out2 == out.map(r => (r.getAs[Long]("k"), r.getAs[Int]("shard"), r.getAs[Int]("pos"))).toSet)
    // APPEND-STABLE: adding rows never reorders existing pairs within a
    // shard (hash order is content-determined) — the property
    // orderBy(rand()) lacks
    val bigger = spark.range(600).selectExpr("id as k", "cast(id % 3 as string) as tag")
    val after = graft.etl.Sampling.shuffleShards(bigger, "k", nShards = 8)
      .collect().filter(_.getAs[Long]("k") < 500)
    def orderWithin(rs: Array[org.apache.spark.sql.Row]): Map[Int, Seq[Long]] =
      rs.groupBy(_.getAs[Int]("shard")).map { case (s, g) =>
        s -> g.sortBy(_.getAs[Int]("pos")).map(_.getAs[Long]("k")).toSeq
      }
    assert(orderWithin(after) == orderWithin(out))
  }

  test("interleaveSources: sort keys cycle sources round-robin within " +
    "a shard; deterministic under layout") {
    val df = spark.range(300)
      .selectExpr("id as k", "concat('src', cast(id % 3 as string)) as src")
    val out = graft.etl.Sampling
      .interleaveSources(df, "src", "k", nShards = 4).collect()
    assert(out.length == 300)
    // src_idx is the lexicographic source index
    val idx = out.map(r => r.getAs[String]("src") -> r.getAs[Int]("src_idx"))
      .toMap
    assert(idx == Map("src0" -> 1, "src1" -> 2, "src2" -> 3))
    // within each (source, shard): ranks are exactly 1..count
    out.groupBy(r => (r.getAs[String]("src"), r.getAs[Int]("shard")))
      .values.foreach { rs =>
        assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rs.length))
      }
    // ROUND-ROBIN: in the (shard, rank, src_idx) emit order, every
    // source present at rank r in a shard appears before ANY source's
    // rank r+1 doc — no source can clump
    out.groupBy(_.getAs[Int]("shard")).values.foreach { rs =>
      val ordered = rs.sortBy(r =>
        (r.getAs[Int]("rank"), r.getAs[Int]("src_idx")))
      val ranks = ordered.map(_.getAs[Int]("rank")).toSeq
      assert(ranks == ranks.sorted) // ranks never regress in emit order
      // consecutive same-rank entries are distinct sources in idx order
      ordered.toSeq.groupBy(_.getAs[Int]("rank")).values.foreach { g =>
        val idxs = g.map(_.getAs[Int]("src_idx"))
        assert(idxs == idxs.sorted && idxs.distinct == idxs)
      }
    }
    // deterministic under physical layout
    val out2 = graft.etl.Sampling
      .interleaveSources(df.repartition(7), "src", "k", nShards = 4)
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Int]("shard"),
        r.getAs[Int]("rank"), r.getAs[Int]("src_idx"))).toSet
    assert(out2 == out.map(r => (r.getAs[Long]("k"), r.getAs[Int]("shard"),
      r.getAs[Int]("rank"), r.getAs[Int]("src_idx"))).toSet)
  }

  test("funnel: out-of-order stages don't convert; strictly-after rule enforced") {
    import spark.implicits._
    val dir = tempDir("graft_funnel")
    def ts(min: Int) = new java.sql.Timestamp(60000L * min)
    // u1 completes in order; u2 clicks BEFORE viewing (no stage-2);
    // u3 purchases BEFORE clicking (stage 2 yes, stage 3 no);
    // u4 only views
    Seq(
      (1L, ts(1), 1L, "view"), (2L, ts(2), 1L, "click"), (3L, ts(3), 1L, "purchase"),
      (4L, ts(2), 2L, "click"), (5L, ts(3), 2L, "view"),
      (6L, ts(1), 3L, "view"), (7L, ts(5), 3L, "click"), (8L, ts(4), 3L, "purchase"),
      (9L, ts(1), 4L, "view")
    ).toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.analytics.Queries.funnel(spark, dir)
      .collect().map(r => r.getAs[Int]("stage") ->
        (r.getAs[Long]("n_users"), r.getAs[Double]("conversion"))).toMap
    assert(out(1) == ((4L, 1.0)))   // all four view (u2 later, still views)
    assert(out(2) == ((2L, 0.5)))   // u1, u3 click after first view
    assert(out(3) == ((1L, 0.25)))  // only u1 purchases after the click
  }

  test("retentionCohorts: hand-built two-cohort triangle, shares of cohort size") {
    import spark.implicits._
    val dir = tempDir("graft_ret")
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00")
    // week1 = 2024-01-01 (Mon): users 1,2 start; week2 = 2024-01-08:
    // user 3 starts, user 1 returns; week3: user 2 returns
    Seq(
      (1L, ts(2), 1L), (2L, ts(3), 2L),               // cohort w1
      (3L, ts(9), 3L), (4L, ts(10), 1L),              // w2: new u3, u1 back
      (5L, ts(16), 2L)                                // w3: u2 back
    ).map { case (e, t, u) => (e, t, u, "view") }
      .toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.analytics.Queries.retentionCohorts(spark, dir)
      .collect().map(r => (r.getAs[String]("cohort_week"), r.getAs[Int]("week_offset")) ->
        (r.getAs[Long]("n_active"), r.getAs[Double]("retention"))).toMap
    assert(out(("2024-01-01", 0)) == ((2L, 1.0)))
    assert(out(("2024-01-01", 1)) == ((1L, 0.5)))  // u1 back in w2
    assert(out(("2024-01-01", 2)) == ((1L, 0.5)))  // u2 back in w3
    assert(out(("2024-01-08", 0)) == ((1L, 1.0)))  // u3's own cohort
    assert(out.size == 4)
  }

  test("scd2AsOf returns exactly the intervals covering the instant") {
    val hist = Seq(
      (1L, "s1", 1L, Some(5L)), (1L, "s2", 5L, Some(10L)),
      (1L, "s3", 10L, None: Option[Long]), (2L, "t1", 8L, None: Option[Long]))
      .toDF("k", "state", "valid_from", "valid_to")
    def at(t: Long) = Etl.scd2AsOf(hist, lit(t)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(at(7L) == Map(1L -> "s2"))              // inside [5,10); key 2 not yet
    assert(at(12L) == Map(1L -> "s3", 2L -> "t1")) // open intervals cover
    assert(at(5L) == Map(1L -> "s2"))              // boundary: valid_from inclusive
    assert(at(0L) == Map.empty[Long, String])
  }

  test("validateRows: NULL predicate is a violation, names in declared order") {
    val df = Seq(
      (1L, Some(10.0), Some("O")),   // clean
      (2L, Some(-5.0), Some("X")),   // fails price + status
      (3L, None: Option[Double], Some("F"))) // NULL price → fails price
      .toDF("k", "price", "status")
    val rules = Seq(
      "price_pos" -> (col("price") > 0),
      "status_known" -> col("status").isin("O", "F"))
    val out = Etl.validateRows(df, Seq("k"), rules).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(out(1L) == ("", 0))
    assert(out(2L) == ("price_pos,status_known", 2)) // declared order
    assert(out(3L) == ("price_pos", 1))              // NULL fails the rule
    val summary = Etl.validateSummary(
      Etl.validateRows(df, Seq("k"), rules), rules.map(_._1)).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(summary("price_pos") == ((2L, 3L)))
    assert(summary("status_known") == ((1L, 3L)))
  }

  test("packSequences: contiguous per-shard layout, exact span arithmetic") {
    val docs = (0L until 200L).map(i =>
      (i, "tok " * (1 + (i % 37)).toInt)).toSeq.toDF("doc_id", "text")
    val out = graft.etl.Sampling.packSequences(docs, "doc_id", "text",
      seqLen = 64, shards = 4)
    val rows = out.collect()
    assert(rows.length == 200)
    rows.foreach { r =>
      val (n, first, off, nSeqs) = (r.getInt(2), r.getLong(3), r.getLong(4),
        r.getInt(5))
      assert(off >= 0 && off < 64)                     // offset inside a sequence
      // span arithmetic: a doc starting at offset `off` with n tokens
      // touches exactly ceil((off + n) / 64) - 0-based-first sequences
      val lastSeq = first + ((off + n - 1) / 64)
      assert(nSeqs == (lastSeq - first + 1))
      assert(nSeqs >= 1 && nSeqs <= n / 64 + 2)
    }
    // conservation per shard: token positions tile the stream contiguously —
    // total tokens in the shard == final doc's (seq_first*64 + off + n)
    rows.groupBy(_.getInt(1)).foreach { case (_, rs) =>
      val total = rs.map(_.getInt(2).toLong).sum
      val maxEnd = rs.map(r =>
        r.getLong(3) * 64 + r.getLong(4) + r.getInt(2)).max
      assert(total == maxEnd)
    }
    // deterministic under physical layout
    val a = rows.map(_.toSeq).toSet
    val b = graft.etl.Sampling.packSequences(docs.repartition(7), "doc_id",
      "text", seqLen = 64, shards = 4).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("rowChecksum/copyInto fingerprints see null-shifts: (a,null,b) != (a,b,null)") {
    // concat_ws SKIPS nulls, so without the chr(1) sentinel both rows
    // below rendered to the same 'a|b' — an audit fingerprint blind to
    // exactly the drift (a value sliding into the wrong column) it
    // exists to catch. Null must also differ from empty string.
    val schema = StructType(Seq(StructField("x", StringType),
      StructField("y", StringType), StructField("z", StringType)))
    def sum1(rows: Row*) = Etl.rowChecksum(
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema),
      Seq("x", "y", "z")).head().getLong(0)
    val shiftA = sum1(Row("a", null, "b"))
    val shiftB = sum1(Row("a", "b", null))
    val empty = sum1(Row("a", "", "b"))
    assert(shiftA != shiftB && shiftA != empty && shiftB != empty)
    // per-row form: same property on copyInto's etl_load_row
    val fp = Etl.copyInto(
      spark.createDataFrame(java.util.Arrays.asList(
        Row("a", null, "b"), Row("a", "b", null)), schema), "b1")
      .select("etl_load_row").collect().map(_.getLong(0))
    assert(fp(0) != fp(1))
  }

  test("sourceStats: exact counts and integer-ppm shares on planted mix") {
    val docs = Seq(("A", "a b"), ("A", "c"), ("B", "d e f"))
      .toDF("source", "text")
    val out = graft.etl.Sampling.sourceStats(docs).collect()
      .map(r => r.getString(0) -> r.toSeq.tail).toMap
    // A: 2 docs / 3 tokens / 4 chars; totals 3 docs / 6 tokens
    assert(out("A") == Seq(2L, 3L, 4L, 2L * 1000000L / 3L, 500000L))
    assert(out("B") == Seq(1L, 3L, 5L, 1000000L / 3L, 500000L))
  }

  test("starJoin: customer join shuffles when nothing fits broadcast; " +
    "fixed dims stay hinted") {
    // VERDICT r13 item 2: the old plan force-broadcast the full customer
    // dim — a multi-TB driver OOM at the 100 TB target, hidden at test
    // SFs where customer happens to fit. The contract now: only the
    // FIXED-cardinality dims (nation 25 / region 5 rows) carry a
    // broadcast hint; customer goes through AQE's size-gated path. With
    // autoBroadcastJoinThreshold=-1 (modeling "dims side too big to
    // fit"), the orders ⨝ customer join MUST appear as a shuffle join
    // (SMJ/shuffled-hash) while the hinted nation/region joins remain
    // BroadcastHashJoins — proving the hint is on the small dims only,
    // never hard-coded on the scale-proportional side.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val q = graft.analytics.Queries.starJoin(spark, sfDir)
      assert(q.collect().length == 25) // 25 nations — values unchanged
      val plan = q.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      val smj = "SortMergeJoin".r.findAllIn(plan).length +
        "ShuffledHashJoin".r.findAllIn(plan).length
      val bhj = "BroadcastHashJoin".r.findAllIn(plan).length
      assert(smj == 1, s"orders-customer must shuffle at threshold=-1:\n$plan")
      assert(bhj == 2, s"nation/region hints must survive threshold=-1:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
