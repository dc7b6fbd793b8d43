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
    val dir = java.nio.file.Files.createTempDirectory("graft_qa").toString
    val out = Qa.runPipeline(df, "period", Seq("num", "cat", "when"),
      outDir = Some(dir))
    assert(out.keySet == Set("missing_data", "vals_continuous", "vals_date",
      "vals_categorical", "comparisons"))
    assert(out("vals_continuous").collect().map(_.getString(1)).toSet == Set("num"))
    assert(out("vals_date").collect().map(_.getString(1)).toSet == Set("when"))
    assert(out("vals_categorical").collect().map(_.getString(1)).toSet == Set("cat"))
    // export step wrote parquet per family
    assert(spark.read.parquet(s"$dir/missing_data").count() == 6)
  }

  test("comparePeriods flags relative mean change above threshold") {
    val longDf = Seq(("p1", "x", 100.0), ("p2", "x", 101.0), ("p3", "x", 110.0))
      .toDF("period", "varname", "mean")
    val out = Qa.comparePeriods(longDf, "period", relThreshold = 2.0)
      .collect().map(r => (r.getString(0), r.getInt(5))).toMap
    assert(out("p2") == 0) // 1% change, under threshold
    assert(out("p3") == 1) // ~8.9% change, flagged
  }
}
