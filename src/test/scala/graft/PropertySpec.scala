package graft

import graft.core.Observations._
import graft.ext.Dedup
import graft.model.Parameters
import graft.ops.{Interpolate, Resample}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck properties (SURVEY.md §5 item 3): algebraic invariants that
  * must hold for any input, not just fixtures. Generators are sampled with
  * fixed seeds (each case runs real Spark jobs, so cases are few and
  * reproducible). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def forAll[A](gen: Gen[A], cases: Int = 8)(body: A => Unit): Unit =
    (0 until cases).foreach { i =>
      gen(Gen.Parameters.default, Seed(i.toLong)) match {
        case Some(a) => body(a)
        case None => fail(s"generator failed for seed $i")
      }
    }

  private val seriesGen: Gen[List[(Int, Option[Double])]] = for {
    n <- Gen.choose(1, 40)
    vals <- Gen.listOfN(n, Gen.option(Gen.choose(-100.0, 100.0)))
  } yield vals.zipWithIndex.map { case (v, i) => (i, v) }

  private def toDf(rows: List[(Int, Option[Double])]): DataFrame =
    rows.map { case (i, v) =>
      ("s", java.sql.Timestamp.from(
        java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(i * 60L)),
        v.map(Double.box).orNull)
    }.toDF(KeyCol, TsCol, ValueCol)
      .select(col(KeyCol), col(TsCol), col(ValueCol).cast("double").as(ValueCol))

  test("interpolation is idempotent: interp(interp(x)) == interp(x)") {
    forAll(seriesGen) { rows =>
      val once = Interpolate.transform(toDf(rows), Parameters.empty)
      val twice = Interpolate.transform(once, Parameters.empty)
      val a = once.orderBy(TsCol).select(ValueCol).collect().toSeq
      val b = twice.orderBy(TsCol).select(ValueCol).collect().toSeq
      assert(a == b)
    }
  }

  test("interpolation leaves gap-free series unchanged") {
    forAll(seriesGen.map(_.map { case (i, v) => (i, Some(v.getOrElse(1.5))) })) { rows =>
      val in = toDf(rows)
      val out = Interpolate.transform(in, Parameters.empty)
      assert(out.exceptAll(in).count() == 0 && in.exceptAll(out).count() == 0)
    }
  }

  test("resample is partition-count invariant") {
    forAll(seriesGen) { rows =>
      val in = toDf(rows)
      val r1 = Resample.transformFixed(in.repartition(1), 300, grid = true)
        .orderBy(TsCol).collect().toSeq
      val r7 = Resample.transformFixed(in.repartition(7), 300, grid = true)
        .orderBy(TsCol).collect().toSeq
      assert(r1 == r7)
    }
  }

  test("resample preserves the per-series value sum for exact inputs (grid or not)") {
    // mean*count per bucket sums to the series total when inputs have <= 2
    // decimals (detMean's decimal sum is exact there)
    forAll(seriesGen.map(_.map { case (i, v) =>
      (i, v.map(x => math.rint(x * 100) / 100)) })) { rows =>
      val in = toDf(rows)
      val bucketed = in.groupBy(col(KeyCol),
          window(col(TsCol), "300 seconds").getField("start").as(TsCol))
        .agg(Resample.detMean(col(ValueCol)).as(ValueCol),
          count(col(ValueCol)).as("n"))
      val lhs = bucketed.agg(sum(col(ValueCol) * col("n"))).as[Double].head()
      val rhs = in.agg(sum(ValueCol)).as[Double].head()
      assert(math.abs(lhs - rhs) < 1e-6)
    }
  }

  test("PCA scatter accumulation is partition-count invariant (bit-exact)") {
    // two correlated series over the same axis; decimal accumulators must
    // make every model field identical under any partitioning
    forAll(seriesGen.map(_.collect { case (i, Some(v)) => (i, v) })
        .suchThat(_.size >= 3), cases = 4) { rows =>
      val in = rows.flatMap { case (i, v) =>
        val ts = java.sql.Timestamp.from(
          java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(i * 60L))
        Seq(("x", ts, math.rint(v * 100) / 100),
          ("y", ts, math.rint(v * 37) / 100 + 1.0))
      }.toDF(KeyCol, TsCol, ValueCol)
      val m1 = graft.ops.Pca.fit(in.repartition(1), Seq("x", "y"))
      val m7 = graft.ops.Pca.fit(in.repartition(7), Seq("x", "y"))
      assert(m1.n == m7.n)
      assert(m1.mean.toSeq == m7.mean.toSeq)
      assert(m1.cov.map(_.toSeq).toSeq == m7.cov.map(_.toSeq).toSeq)
      assert(m1.eigenValues.toSeq == m7.eigenValues.toSeq)
      assert(m1.eigenVectors.map(_.toSeq).toSeq ==
        m7.eigenVectors.map(_.toSeq).toSeq)
    }
  }

  test("sort/fault operators are partition-count invariant") {
    forAll(seriesGen, cases = 4) { rows =>
      val in = toDf(rows)
      def run(df: DataFrame): Seq[String] = {
        val sorted = graft.ops.SortValues.transform(df, Parameters.empty)
          .orderBy(TsCol).select(col(ValueCol).cast("string"))
          .as[String].collect().toSeq
        val classes = graft.ops.FaultIdentify.transform(df,
            Parameters.of("lo" -> "-50.0", "hi" -> "50.0", "jump" -> "30.0"))
        val diag = graft.ops.FaultDiagnose.transform(classes,
            Parameters.of("high_pct" -> "10", "jump_pct" -> "20", "low_pct" -> "10"))
          .select(col(ValueCol)).as[String].collect().toSeq
        sorted ++ diag
      }
      assert(run(in.repartition(1)) == run(in.repartition(7)))
    }
  }

  private val wordsGen: Gen[List[String]] = for {
    n <- Gen.choose(1, 60)
    ws <- Gen.listOfN(n, Gen.alphaLowerStr.map(_.take(6)).suchThat(_.nonEmpty))
  } yield ws

  test("Bloom filter never false-negatives and is monotone under corpus growth") {
    forAll(Gen.zip(wordsGen, wordsGen), cases = 6) { case (corpusW, extraW) =>
      val m = 256; val k = 4 // small enough that collisions actually occur
      val corpus = corpusW.distinct.zipWithIndex
        .map { case (w, i) => (i.toLong, w) }.toDF("id", "key")
      val bits = Dedup.bloomBuild(corpus, "key", m, k)
      // every inserted key flags as present — for ANY corpus and any m
      val self = Dedup.bloomProbe(corpus, "id", "key", bits, m, k)
      assert(self.where(col("maybe_dup") === 0L).count() == 0,
        "false negative on an inserted key")
      // growing the corpus can only ADD set bits: flags are monotone
      val grown = corpus.unionByName(extraW.distinct.zipWithIndex
        .map { case (w, i) => (10000L + i, w) }.toDF("id", "key"))
      val bitsG = Dedup.bloomBuild(grown, "key", m, k)
      val before = Dedup.bloomProbe(corpus, "id", "key", bits, m, k)
      val after = Dedup.bloomProbe(corpus, "id", "key", bitsG, m, k)
      val regressed = before.as("a").join(after.as("b"),
          col("a.id") === col("b.id"))
        .where(col("a.maybe_dup") === 1L && col("b.maybe_dup") === 0L)
      assert(regressed.count() == 0, "flag flipped off as corpus grew")
    }
  }

  test("count-min estimates never underestimate; halves sum to the whole") {
    forAll(wordsGen, cases = 6) { ws =>
      val d = 3; val w = 16 // force collisions
      val tf = ws.groupBy(identity).map { case (t, xs) => (t, xs.size.toLong) }
        .toSeq.toDF("term", "cnt")
      val sketch = graft.ext.Sketches.cmsBuild(tf, "term", "cnt", d, w)
      val est = graft.ext.Sketches.cmsEstimate(tf.select(col("term")),
          "term", sketch, d, w)
        .join(tf, "term")
      assert(est.where(col("est") < col("cnt")).count() == 0,
        "count-min underestimated")
      // mergeability on arbitrary splits: cell-wise sum of the halves
      // equals the whole corpus's sketch
      val (a, b) = (tf.where(length(col("term")) % 2 === 0),
        tf.where(length(col("term")) % 2 =!= 0))
      val merged = graft.ext.Sketches.cmsBuild(a, "term", "cnt", d, w)
        .unionByName(graft.ext.Sketches.cmsBuild(b, "term", "cnt", d, w))
        .groupBy("row", "cell").agg(sum("cnt").as("cnt"))
      assert(merged.exceptAll(sketch).isEmpty && sketch.exceptAll(merged).isEmpty)
    }
  }

  test("meanVectorByKey is partition-count invariant and exact on 2dp inputs") {
    forAll(Gen.listOfN(12, Gen.zip(Gen.choose(0, 2), Gen.listOfN(4,
        Gen.choose(-100.0, 100.0).map(x => math.rint(x * 100) / 100)))),
        cases = 4) { rows =>
      val df = rows.zipWithIndex.map { case ((lab, vec), i) =>
        (i.toLong, lab, vec) }.toDF("id", "label", "vec")
      val a = graft.ext.Similarity.meanVectorByKey(df.repartition(1), "label", "vec")
        .orderBy("label", "dim").collect().toSeq
      val b = graft.ext.Similarity.meanVectorByKey(df.repartition(7), "label", "vec")
        .orderBy("label", "dim").collect().toSeq
      assert(a == b)
      // exact against a driver-side rational mean on 2dp inputs
      val expected = rows.groupBy(_._1).map { case (lab, grp) =>
        val dims = grp.map(_._2)
        lab -> (0 until 4).map { d =>
          val exact = (dims.map(v => BigDecimal(v(d))).sum /
            dims.size).toDouble
          math.rint(exact * 1e6) / 1e6
        }
      }
      a.foreach { r =>
        val (lab, dim, m) = (r.getInt(0), r.getInt(1), r.getDouble(2))
        assert(math.abs(m - expected(lab)(dim)) < 1e-9, s"label=$lab dim=$dim")
      }
    }
  }

  test("exact dedup is idempotent and keeps one row per key") {
    val docs = spark.read.parquet(sf("documents"))
    val withDups = docs.unionByName(docs.limit(100)) // plant exact dups
    val once = Dedup.exact(withDups.select(col("doc_id"), col("text")),
      Seq("text"), "doc_id")
    assert(once.count() == docs.select("text").distinct().count())
    // keepers are stable under re-dedup of the kept rows (fresh read to
    // avoid self-join attribute ambiguity)
    val fresh = spark.read.parquet(sf("documents"))
      .select(col("doc_id").as("id2"), col("text").as("text2"))
    val keyed = once.join(fresh, once("doc_id") === fresh("id2"))
      .select(col("id2").as("doc_id"), col("text2").as("text"))
    val twice = Dedup.exact(keyed, Seq("text"), "doc_id")
    assert(twice.select("doc_id").exceptAll(once.select("doc_id")).count() == 0)
  }

  private val vecGen: Gen[List[Float]] = for {
    d <- Gen.choose(2, 24)
    vs <- Gen.listOfN(d, Gen.choose(-8.0f, 8.0f))
  } yield vs

  test("quantizeInt8: |q| <= 127 via L1 bound, reconstruction error <= scale/2") {
    import graft.ext.Similarity
    forAll(vecGen) { vs =>
      val df = Seq((1L, vs.toArray)).toDF("vec_id", "embedding")
      val r = Similarity.quantizeInt8(df, "vec_id", "embedding").head()
      val scale = r.getDouble(1)
      // every |q_i| <= 127 => L1 bounded by 127 * dims
      assert(r.getLong(3) <= 127L * vs.size)
      // half-up quantization error can never exceed half a step (6-dp
      // rounding of the reported bound adds at most 5e-7)
      assert(r.getDouble(4) <= scale / 2 + 5e-7,
        s"err ${r.getDouble(4)} vs scale $scale for $vs")
    }
  }

  test("signProjection is linear: proj(2x) == 2 * proj(x) exactly") {
    import graft.ext.Similarity
    forAll(vecGen, cases = 4) { vs =>
      val df = Seq((1L, vs.toArray), (2L, vs.map(_ * 2).toArray))
        .toDF("vec_id", "embedding")
      val out = Similarity.signProjection(df, "vec_id", "embedding", k = 4)
        .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
      (0 until 4).foreach { j =>
        // doubling float inputs is exact and signs are ±1, so the only
        // slack is the two 6-dp roundings (<= 5e-7 each, one scaled 2x)
        assert(math.abs(out((2L, j)) - 2 * out((1L, j))) <= 1.6e-6,
          s"dim $j: ${out((2L, j))} vs 2*${out((1L, j))}")
      }
    }
  }
}
