package graft

import graft.core.Observations._
import graft.model.Parameters
import graft.ops._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hand-computed operator semantics (the SURVEY.md §7.4 watch-list items:
  * full-grid resample, interpolation edge rules). */
class TransformsSpec extends SparkSpec {
  import spark.implicits._

  private def obs(rows: (String, String, java.lang.Double)*): DataFrame =
    rows.toSeq.toDF(KeyCol, "ts_s", ValueCol)
      .select(col(KeyCol), to_timestamp(col("ts_s")).as(TsCol), col(ValueCol))

  private def collectSeries(df: DataFrame): Seq[(String, java.lang.Double)] =
    df.orderBy(KeyCol, TsCol)
      .select(date_format(col(TsCol), "HH:mm").as("t"), col(ValueCol))
      .as[(String, java.lang.Double)].collect().toSeq

  test("resample: mean per bucket, full grid emits null buckets (pandas parity)") {
    val in = obs(
      ("a", "2024-01-01 00:01:00", 1.0),
      ("a", "2024-01-01 00:04:00", 3.0),
      // 00:05 bucket empty
      ("a", "2024-01-01 00:11:00", 10.0))
    val out = collectSeries(Resample.transformFixed(in, 300, grid = true))
    assert(out == Seq(("00:00", 2.0: java.lang.Double), ("00:05", null),
      ("00:10", 10.0: java.lang.Double)))
  }

  test("integer-axis resample grids buckets and interpolation fills the gaps (RangeIndex)") {
    val in = Seq(("a", 1L, 1.0), ("a", 4L, 3.0), ("a", 21L, 10.0))
      .toDF(KeyCol, IntAxis.IdxCol, ValueCol)
    val grid = IntAxis.resampleFixed(in, 10L, grid = true)
      .orderBy(IntAxis.IdxCol)
      .select(col(IntAxis.IdxCol), col(ValueCol))
      .as[(Long, java.lang.Double)].collect().toSeq
    assert(grid == Seq((0L, 2.0: java.lang.Double), (10L, null),
      (20L, 10.0: java.lang.Double)))
    val interp = IntAxis.interpolate(IntAxis.resampleFixed(in, 10L, grid = true))
      .orderBy(IntAxis.IdxCol)
      .select(col(ValueCol)).as[Double].collect().toSeq
    assert(interp == Seq(2.0, 6.0, 10.0)) // midpoint of 2 and 10
    // negative axis buckets floor correctly
    val neg = IntAxis.resampleFixed(
      Seq(("a", -11L, 4.0)).toDF(KeyCol, IntAxis.IdxCol, ValueCol),
      10L, grid = false)
      .select(col(IntAxis.IdxCol)).as[Long].head()
    assert(neg == -20L)
  }

  test("calendar resample bins by month with the deterministic mean") {
    val in = obs(
      ("a", "2024-01-05 10:00:00", 1.0),
      ("a", "2024-01-20 00:00:00", 3.0),
      ("a", "2024-02-01 00:00:00", 10.0), // month boundary is inclusive-left
      ("a", "2024-03-31 23:59:59", 7.0))
    val out = ResampleCalendar.transform(in, Parameters.of("frequency" -> "MS"))
      .orderBy(TsCol)
      .select(date_format(col(TsCol), "yyyy-MM-dd"), col(ValueCol))
      .as[(String, Double)].collect().toSeq
    assert(out == Seq(("2024-01-01", 2.0), ("2024-02-01", 10.0), ("2024-03-01", 7.0)))
    intercept[IllegalArgumentException] {
      ResampleCalendar.transform(in, Parameters.of("frequency" -> "5min"))
    }
  }

  test("resample_last keeps the latest observation per bucket for any dtype") {
    val in = Seq(
      ("a", "2024-01-01 00:01:00", "on"),
      ("a", "2024-01-01 00:04:00", "off"),
      ("a", "2024-01-01 00:11:00", "on"))
      .toDF(KeyCol, "ts_s", ValueCol)
      .select(col(KeyCol), to_timestamp(col("ts_s")).as(TsCol), col(ValueCol))
    val out = ResampleLast.transformFixed(in, 300)
      .orderBy(TsCol)
      .select(date_format(col(TsCol), "HH:mm"), col(ValueCol))
      .as[(String, String)].collect().toSeq
    assert(out == Seq(("00:00", "off"), ("00:10", "on")))
  }

  test("resample non-grid emits only non-empty buckets") {
    val in = obs(
      ("a", "2024-01-01 00:01:00", 1.0),
      ("a", "2024-01-01 00:11:00", 10.0))
    val out = collectSeries(Resample.transformFixed(in, 300, grid = false))
    assert(out == Seq(("00:00", 1.0: java.lang.Double), ("00:10", 10.0: java.lang.Double)))
  }

  test("interpolation: interior linear, leading null stays, trailing forward-fills") {
    val in = obs(
      ("a", "2024-01-01 00:00:00", null), // leading gap -> stays null
      ("a", "2024-01-01 00:05:00", 1.0),
      ("a", "2024-01-01 00:10:00", null), // interior -> 2.0
      ("a", "2024-01-01 00:15:00", 3.0),
      ("a", "2024-01-01 00:20:00", null)) // trailing -> 3.0 (ffill)
    val out = collectSeries(Interpolate.transform(in, Parameters.empty))
    assert(out == Seq(
      ("00:00", null),
      ("00:05", 1.0: java.lang.Double),
      ("00:10", 2.0: java.lang.Double),
      ("00:15", 3.0: java.lang.Double),
      ("00:20", 3.0: java.lang.Double)))
  }

  test("interpolation weights by time distance on irregular grids") {
    val in = obs(
      ("a", "2024-01-01 00:00:00", 0.0),
      ("a", "2024-01-01 00:01:00", null), // 1/4 of the way -> 4.0
      ("a", "2024-01-01 00:04:00", 16.0))
    val out = collectSeries(Interpolate.transform(in, Parameters.empty))
    assert(out(1)._2 == 4.0)
  }

  test("replace_ranges nulls inclusive ranges, keeps the rest") {
    val in = obs(
      ("a", "2024-01-01 00:00:00", 1.0),
      ("a", "2024-01-01 00:05:00", 2.0),
      ("a", "2024-01-01 00:10:00", 3.0))
    val out = collectSeries(ReplaceRanges.transform(in, Parameters.of(
      "ranges" -> "2024-01-01 00:05:00/2024-01-01 00:10:00")))
    assert(out == Seq(("00:00", 1.0: java.lang.Double), ("00:05", null), ("00:10", null)))
    val out2 = collectSeries(ReplaceRanges.transform(in, Parameters.of(
      "ranges" -> "2024-01-01 00:05:00/2024-01-01 00:05:00",
      "replace_with" -> "99.5")))
    assert(out2 == Seq(("00:00", 1.0: java.lang.Double),
      ("00:05", 99.5: java.lang.Double), ("00:10", 3.0: java.lang.Double)))
  }

  test("predict_previous_point shifts timestamps one frequency forward") {
    val in = obs(
      ("a", "2024-01-01 00:00:00", 1.0),
      ("a", "2024-01-01 00:05:00", 2.0))
    val out = collectSeries(PredictPrevious.transform(in,
      Parameters.of("frequency" -> "5min")))
    assert(out == Seq(("00:05", 1.0: java.lang.Double), ("00:10", 2.0: java.lang.Double)))
    assert(PredictPrevious.stepDistance == 1)
  }

  test("multiple series transform independently in one pass") {
    val in = obs(
      ("a", "2024-01-01 00:01:00", 2.0),
      ("b", "2024-01-01 00:02:00", 8.0))
    val out = Resample.transformFixed(in, 300, grid = true)
      .orderBy(KeyCol).select(KeyCol, ValueCol).as[(String, Double)].collect().toSeq
    assert(out == Seq(("a", 2.0), ("b", 8.0)))
  }

  test("smoothing: centered moving average over +/-k rows, edges use fewer points") {
    val in = obs(
      ("a", "2024-01-01 00:00:00", 1.0),
      ("a", "2024-01-01 00:05:00", 2.0),
      ("a", "2024-01-01 00:10:00", 6.0))
    val out = collectSeries(Smooth.transform(in, Parameters.of("window" -> "1")))
    assert(out == Seq(("00:00", 1.5: java.lang.Double), ("00:05", 3.0: java.lang.Double),
      ("00:10", 4.0: java.lang.Double)))
  }

  test("ewma: adjusted weights, window truncation, alpha=1/2 exact fractions") {
    val in = obs(
      ("a", "2024-01-01 00:00:00", 1.0),
      ("a", "2024-01-01 00:05:00", 2.0),
      ("a", "2024-01-01 00:10:00", 3.0))
    // adjusted EWMA, full history: [1], [1,2], [1,2,3]
    //   t1 = 1; t2 = (0.5·1+2)/1.5 = 5/3; t3 = (0.25+1+3)/1.75 = 17/7
    val full = collectSeries(Ewma.transform(in, Parameters.of("window" -> "32")))
    assert(full.map(_._2.doubleValue()) == Seq(1.0, 2.5 / 1.5, 4.25 / 1.75))
    // window=2 truncates t3's frame to [2,3]: (0.5·2+3)/1.5 = 8/3
    val trunc = collectSeries(Ewma.transform(in, Parameters.of("window" -> "2")))
    assert(trunc.map(_._2.doubleValue()) == Seq(1.0, 2.5 / 1.5, 4.0 / 1.5))
  }

  test("fault detection flags out-of-range values, nulls pass through") {
    val in = obs(
      ("a", "2024-01-01 00:00:00", 5.0),
      ("a", "2024-01-01 00:05:00", 50.0),
      ("a", "2024-01-01 00:10:00", null),
      ("a", "2024-01-01 00:15:00", 200.0))
    val out = collectSeries(DetectOutOfRange.transform(in,
      Parameters.of("lo" -> "10.0", "hi" -> "150.0")))
    assert(out == Seq(("00:00", 1.0: java.lang.Double), ("00:05", 0.0: java.lang.Double),
      ("00:10", null), ("00:15", 1.0: java.lang.Double)))
  }

  test("duplicate-timestamp removal keeps the min value per (series, ts)") {
    val in = obs(
      ("a", "2024-01-01 00:00:00", 3.0),
      ("a", "2024-01-01 00:00:00", 1.0),
      ("a", "2024-01-01 00:05:00", 2.0))
    val out = collectSeries(DedupTimestamps.transform(in, Parameters.empty))
    assert(out == Seq(("00:00", 1.0: java.lang.Double), ("00:05", 2.0: java.lang.Double)))
  }

  test("sort_values re-indexes by ascending value rank (nulls last, ts tie-break)") {
    val in = obs(
      ("a", "2024-01-01 00:00:00", 5.0),
      ("a", "2024-01-01 00:01:00", 1.0),
      ("a", "2024-01-01 00:02:00", null),
      ("a", "2024-01-01 00:03:00", 3.0),
      ("b", "2024-01-01 00:00:00", 2.0))
    val out = SortValues.transform(in, Parameters.empty)
      .orderBy(KeyCol, TsCol)
      .select(col(KeyCol), col(TsCol).cast("long"), col(ValueCol))
      .as[(String, Long, java.lang.Double)].collect().toSeq
    assert(out == Seq(
      ("a", 0L, 1.0: java.lang.Double), ("a", 1L, 3.0: java.lang.Double),
      ("a", 2L, 5.0: java.lang.Double), ("a", 3L, null),
      ("b", 0L, 2.0: java.lang.Double)))
    // the catalog axis becomes a RangeIndex of ranks
    val ix = SortValues.updatedIndex(
      graft.model.IndexMeta(graft.model.IndexKind.DatetimeIndex), Parameters.empty)
    assert(ix.kind == graft.model.IndexKind.RangeIndex && ix.start.contains(0L))
  }

  test("fault identification classifies range violations and jumps") {
    val in = obs(
      ("a", "2024-01-01 00:00:00", 50.0),
      ("a", "2024-01-01 01:00:00", 5.0),    // < lo
      ("a", "2024-01-01 02:00:00", 200.0),  // > hi
      ("a", "2024-01-01 03:00:00", 60.0),   // |60-200|>40 jump
      ("a", "2024-01-01 04:00:00", 65.0),   // ok
      ("a", "2024-01-01 05:00:00", null))   // missing
    val out = FaultIdentify.transform(in,
        Parameters.of("lo" -> "10.0", "hi" -> "150.0", "jump" -> "40.0"))
      .orderBy(TsCol).select(col(ValueCol)).as[String].collect().toSeq
    assert(out == Seq("ok", "low", "high", "jump", "ok", "missing"))
    assert(FaultIdentify.updatedDtype("double") == "string")
  }

  test("fault diagnosis aggregates classes into one severity-ordered verdict") {
    def cls(key: String, cs: Seq[String]): Seq[(String, String, String)] =
      cs.zipWithIndex.map { case (c, i) =>
        (key, f"2024-01-01 ${i}%02d:00:00", c)
      }
    val in = (cls("over", Seq("high", "ok", "ok", "ok", "ok")) ++
      cls("unst", Seq("jump", "jump", "ok", "ok", "ok")) ++
      cls("under", Seq("low", "low", "low", "ok", "ok")) ++
      cls("fine", Seq("ok", "ok", "ok", "ok", "ok")) ++
      cls("gone", Seq("missing", "missing", "missing", "ok", "ok")))
      .toDF(KeyCol, "ts_s", ValueCol)
      .select(col(KeyCol), to_timestamp(col("ts_s")).as(TsCol), col(ValueCol))
    val out = FaultDiagnose.transform(in,
        Parameters.of("high_pct" -> "20", "jump_pct" -> "40", "low_pct" -> "60"))
      .orderBy(KeyCol).select(col(KeyCol), col(ValueCol))
      .as[(String, String)].collect().toMap
    assert(out == Map("over" -> "over_range", "unst" -> "unstable",
      "under" -> "under_range", "fine" -> "healthy",
      "gone" -> "insufficient_data"))
    // engine executor records the string dtype in the catalog so a
    // reloaded verdict series is not cast back to double
    val sig = graft.core.MeteauSignal.ingest(
      in.where(col(KeyCol) === "over").select(col(TsCol), col(ValueCol)),
      "F", "class")
      .process(Seq("F#1_RAW#1"), FaultDiagnose, Parameters.empty)
    assert(sig.meta.seriesMeta("F#1_FAULT-DIAG#1").get.valuesDtype == "string")
  }

  test("PCA: Jacobi eigensolve matches the 2x2 closed form and is orthonormal at d=3") {
    val cov2 = Array(Array(4.0, 1.2), Array(1.2, 2.0))
    val (lam, vec) = Pca.eigenSym(cov2)
    val disc = math.sqrt((4.0 - 2.0) * (4.0 - 2.0) + 4 * 1.2 * 1.2)
    assert(math.abs(lam(0) - (6.0 + disc) / 2) < 1e-12)
    assert(math.abs(lam(1) - (6.0 - disc) / 2) < 1e-12)
    val nrm = math.sqrt(1.2 * 1.2 + (lam(0) - 4.0) * (lam(0) - 4.0))
    assert(math.abs(vec(0)(0) - 1.2 / nrm) < 1e-12)
    assert(math.abs(vec(0)(1) - (lam(0) - 4.0) / nrm) < 1e-12)
    // d=3: eigenvectors orthonormal, A v = lambda v
    val cov3 = Array(
      Array(3.0, 0.5, 0.2), Array(0.5, 2.0, 0.1), Array(0.2, 0.1, 1.0))
    val (l3, v3) = Pca.eigenSym(cov3)
    assert(l3(0) >= l3(1) && l3(1) >= l3(2))
    for (i <- 0 until 3; j <- 0 until 3) {
      val dot = (0 until 3).map(k => v3(i)(k) * v3(j)(k)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9, s"v$i . v$j = $dot")
      val av = (0 until 3).map(k => cov3(i)(k) * v3(j)(k)).sum
      // (A v_j)_i == lambda_j * v_j(i)
      assert(math.abs(av - l3(j) * v3(j)(i)) < 1e-9)
    }
  }

  test("PCA fit + project through the dataset executor (PC1 score signal)") {
    // two correlated series: y = 2x + small noise-free offset
    val rows = (0 until 20).flatMap { i =>
      Seq(("X", f"2024-01-01 ${i}%02d:00:00", i.toDouble),
        ("Y", f"2024-01-01 ${i}%02d:00:00", 2.0 * i + 1.0))
    }
    val in = rows.toDF(KeyCol, "ts_s", ValueCol)
      .select(col(KeyCol), to_timestamp(col("ts_s")).as(TsCol), col(ValueCol))
    val m = Pca.fit(in, Seq("X", "Y"))
    assert(m.n == 20)
    // perfectly correlated: second eigenvalue ~0, PC1 along (1,2)/sqrt(5)
    assert(m.eigenValues(1) < 1e-9 * m.eigenValues(0))
    assert(math.abs(m.eigenVectors(0)(0) - 1.0 / math.sqrt(5)) < 1e-9)
    assert(math.abs(m.eigenVectors(0)(1) - 2.0 / math.sqrt(5)) < 1e-9)
    val scores = Pca.project(in, m, 1)
    assert(scores.count() == 20)
    // score variance equals lambda1 (PCA invariant)
    val varS = scores.agg(var_samp(col(ValueCol))).as[Double].head()
    assert(math.abs(varS - m.eigenValues(0)) < 1e-6 * m.eigenValues(0))
    // and the dataset-level transform registers the category in lineage
    def sigOf(k: String, name: String) = graft.core.MeteauSignal.ingest(
      in.where(col(KeyCol) === k).select(col(TsCol), col(ValueCol)), name, "u")
    val ds = graft.core.MeteauDataset.of("p", Seq(sigOf("X", "X"), sigOf("Y", "Y")))
      .process(Seq("X#1_RAW#1", "Y#1_RAW#1"), PcaSignal)
    val steps = ds.signal("PCA#1").meta.series.head.steps
    assert(steps.last.stepType == graft.model.ProcessingType.DimensionalityReduction)
    assert(ds.signal("PCA#1").series("PCA#1_RAW#1").count() == 20)
  }

  test("timedelta axis: sub-second µs buckets, exact interpolation ratios") {
    // offsets 0 / 250ms / 600ms / 1.2s as epoch-offset timestamps
    val in = Seq(("a", 0L, 1.0), ("a", 250000L, 2.0),
      ("a", 600000L, 3.0), ("a", 1200000L, 9.0))
      .toDF(KeyCol, "us", ValueCol)
      .select(col(KeyCol), timestamp_micros(col("us")).as(TsCol), col(ValueCol))
    // 500ms buckets: [0,0.5)->mean(1,2)=1.5, [0.5,1)->3, [1,1.5)->9
    val out = TimedeltaAxis.resample(in, "500ms", grid = false)
      .orderBy(TsCol)
      .select(unix_micros(col(TsCol)), col(ValueCol))
      .as[(Long, Double)].collect().toSeq
    assert(out == Seq((0L, 1.5), (500000L, 3.0), (1000000L, 9.0)))
    // gridded + interpolated: the empty 1.5s bucket between 9 and a
    // point at 2s fills linearly on the exact µs axis
    val in2 = Seq(("a", 0L, 1.0), ("a", 1000000L, 5.0))
      .toDF(KeyCol, "us", ValueCol)
      .select(col(KeyCol), timestamp_micros(col("us")).as(TsCol), col(ValueCol))
    val interp = TimedeltaAxis.interpolate(
        TimedeltaAxis.resample(in2, "250ms", grid = true))
      .orderBy(TsCol).select(col(ValueCol)).as[Double].collect().toSeq
    assert(interp == Seq(1.0, 2.0, 3.0, 4.0, 5.0))
    // sub-second frequency parsing lands on exact µs
    assert(Freq.micros("250ms") == 250000L)
    assert(Freq.micros("500us") == 500L)
    assert(Freq.micros("2000ns") == 2L)
    assert(Freq.micros("15min") == 900000000L)
    intercept[IllegalArgumentException](Freq.micros("500ns"))
  }

  test("frequency parsing") {
    assert(Freq.seconds("5min") == 300)
    assert(Freq.seconds("6 min") == 360)
    assert(Freq.seconds("1h") == 3600)
    assert(Freq.seconds("D") == 86400)
    assert(Freq.seconds("30s") == 30)
    intercept[IllegalArgumentException](Freq.seconds("1 month"))
  }

  test("LttbDownsample keeps the spike a mean resample would flatten") {
    val in = obs(
      ("a", "2024-01-01 00:10:00", 10.0),
      ("a", "2024-01-01 00:20:00", 12.0),
      ("a", "2024-01-01 01:10:00", 11.0),
      ("a", "2024-01-01 01:20:00", 500.0), // the spike
      ("a", "2024-01-01 01:40:00", 9.0),
      ("a", "2024-01-01 02:10:00", 10.0),
      ("a", "2024-01-01 02:30:00", 12.0))
    val out = collectSeries(LttbDownsample.transform(in,
      Parameters.of("bucketSeconds" -> "3600")))
    // one point per bucket; edge buckets fall back to earliest ts; the
    // middle bucket keeps the SPIKE (max triangle area), which a detMean
    // resample would flatten to ~173
    assert(out == Seq(("00:10", 10.0: java.lang.Double),
      ("01:20", 500.0: java.lang.Double),
      ("02:10", 10.0: java.lang.Double)))
  }

  test("rolling median: outlier-robust interior, two-middle mean at edges") {
    val in = obs(
      ("a", "2024-01-01 00:00:00", 1.0),
      ("a", "2024-01-01 00:01:00", 2.0),
      ("a", "2024-01-01 00:02:00", 100.0), // outlier
      ("a", "2024-01-01 00:03:00", 3.0),
      ("a", "2024-01-01 00:04:00", 4.0))
    val out = collectSeries(
      RollingMedian.transform(in, Parameters.of("window" -> "1")))
    // windows: [1,2]->1.5, [1,2,100]->2, [2,100,3]->3, [100,3,4]->4,
    // [3,4]->3.5 — the outlier never leaks into its neighbors
    assert(out.map(_._2.doubleValue) == Seq(1.5, 2.0, 3.0, 4.0, 3.5))
  }
}
