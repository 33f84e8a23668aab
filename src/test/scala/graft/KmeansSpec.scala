package graft

import graft.ext.{Kmeans, Similarity}
import org.apache.spark.sql.functions._

/** In-engine exact Lloyd k-means + SemDeDup semantic dedup. */
class KmeansSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated anchor clouds in R^4, deterministic offsets (no
  // RNG): even ids orbit anchor A, odd ids orbit anchor B. ids 0 and 1
  // (the two seeds) land one per cloud, so k=2 converges immediately.
  private def cloud(n: Int) = (0 until n).map { i =>
    val g = i % 2
    val base = if (g == 0) Array(10.0, 0.0, 0.0, 1.0)
               else Array(0.0, 10.0, 5.0, -1.0)
    val off = 0.1 * (i / 2)
    (i.toLong, base.zipWithIndex.map { case (b, j) => b + off * (j + 1) / 4.0 }.toSeq, g)
  }.toDF("vec_id", "embedding", "g")

  test("train + assignFinal recover the two planted clouds") {
    val df = cloud(20)
    val m = Kmeans.train(df, "vec_id", "embedding", k = 2, iters = 3)
    val af = Kmeans.assignFinal(df, "vec_id", "embedding", m)
      .join(df.select(col("vec_id"), col("g")), "vec_id")
      .collect()
    assert(af.length === 20)
    af.foreach { r =>
      assert(r.getAs[Long]("cluster") === r.getAs[Int]("g").toLong,
        s"vec ${r.getAs[Long]("vec_id")} assigned off-cloud")
    }
  }

  test("centroids are bit-identical across partitionings") {
    val df = cloud(40)
    def at(parts: Int) =
      Kmeans.train(df.repartition(parts), "vec_id", "embedding",
        k = 2, iters = 3).cents
    val a = at(1)
    val b = at(7)
    for (cl <- a.indices; j <- a(cl).indices)
      assert(java.lang.Double.doubleToLongBits(a(cl)(j)) ===
             java.lang.Double.doubleToLongBits(b(cl)(j)),
        s"centroid ($cl,$j) differs across partitionings")
  }

  test("an empty cluster carries its seed centroid forward") {
    // id 1 duplicates id 0's vector: in round 1 every point ties between
    // clusters 0 and 1 or prefers 0/2, the argmin tie-break sends ties to
    // the lower index, so cluster 1 receives NO members and must keep its
    // (quantized) seed vector as centroid, while 0 and 2 move to the
    // means of their members. (In later rounds the carried-forward seed
    // legitimately wins back the points cluster 0's update moved away
    // from — correct Lloyd dynamics, not tested here.)
    def q6(x: Double) = math.floor(x * 1000000.0 + 0.5) / 1000000.0
    val pts = Seq(
      (0L, Seq(1.0, 1.0, 0.0, 0.0)),
      (1L, Seq(1.0, 1.0, 0.0, 0.0)),
      (2L, Seq(-5.0, -5.0, 1.0, 1.0)),
      (3L, Seq(1.1, 0.9, 0.0, 0.0)),
      (4L, Seq(-5.2, -4.8, 1.0, 1.0))).toDF("vec_id", "embedding")
    val m = Kmeans.train(pts, "vec_id", "embedding", k = 3, iters = 1)
    assert(m.cents(1).toSeq === Seq(1.0, 1.0, 0.0, 0.0))
    assert(m.cents(0).toSeq === Seq(q6(3.1 / 3), q6(2.9 / 3), 0.0, 0.0))
    assert(m.cents(2).toSeq === Seq(q6(-10.2 / 2), q6(-9.8 / 2), 1.0, 1.0))
  }

  test("fast (literal-fold) path matches the exact relational path") {
    val df = cloud(30)
    val me = Kmeans.train(df, "vec_id", "embedding", k = 2, iters = 3)
    val mf = Kmeans.trainFast(df, "vec_id", "embedding", k = 2, iters = 3)
    for (cl <- me.cents.indices; j <- me.cents(cl).indices)
      assert(java.lang.Double.doubleToLongBits(me.cents(cl)(j)) ===
             java.lang.Double.doubleToLongBits(mf.cents(cl)(j)),
        s"fast/exact centroid ($cl,$j) diverge on a tie-free fixture")
    val ae = Kmeans.assignFinal(df, "vec_id", "embedding", me)
      .select(col("vec_id"), col("cluster")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val as = Kmeans.assignServing(df, "vec_id", "embedding", mf)
      .select(col("vec_id"), col("cluster")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ae === as)
  }

  test("native nearest-centroid expression ≡ the HOF reference fold") {
    val df = cloud(40)
    val m = Kmeans.train(df, "vec_id", "embedding", k = 2, iters = 2)
    def dump(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)))).toSet
    assert(dump(Kmeans.assignServing(df, "vec_id", "embedding", m)) ===
           dump(Kmeans.assignServingHof(df, "vec_id", "embedding", m)))
  }

  test("broadcast-centroid serving and training ≡ the reference forms") {
    val df = cloud(40)
    val mf = Kmeans.trainFast(df, "vec_id", "embedding", k = 2, iters = 3)
    // training through per-round broadcasts lands on bit-identical
    // centroids (same kernel, same decimal+grid update)
    val mb = Kmeans.trainFastBcast(df, "vec_id", "embedding", k = 2,
      iters = 3)
    for (cl <- mf.cents.indices; j <- mf.cents(cl).indices)
      assert(java.lang.Double.doubleToLongBits(mf.cents(cl)(j)) ===
             java.lang.Double.doubleToLongBits(mb.cents(cl)(j)),
        s"bcast/reference centroid ($cl,$j) diverge")
    // serving through the broadcast expression is row-for-row
    // bit-identical (dist2 included) to the reference-object form
    val bc = spark.sparkContext.broadcast(mf.cents)
    def dump(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)))).toSet
    assert(dump(Kmeans.assignServing(df, "vec_id", "embedding", mf)) ===
           dump(Kmeans.assignServingBcast(df, "vec_id", "embedding", bc)))
    bc.unpersist(false)
  }

  test("semProbeStream flags copies against members, clears fresh vectors") {
    val base = cloud(20).select(col("vec_id"), col("embedding"))
    val m = Kmeans.train(base, "vec_id", "embedding", k = 2, iters = 2)
    val members = Kmeans.assignServing(base, "vec_id", "embedding", m)
      .join(base.select(col("vec_id"),
        col("embedding").cast("array<double>").as("mv")), "vec_id")
      .select(col("cluster"), col("vec_id").as("member_id"), col("mv"))
    val queries = base.where(col("vec_id") < 3)
      .select((col("vec_id") + 500L).as("vec_id"), col("embedding"))
      .unionByName(base.where(col("vec_id") === 4)
        .select(lit(600L).as("vec_id"),
          transform(col("embedding"), x => -x).as("embedding")))
    // batch evaluation of the streaming probe's plan (stream-static
    // joins evaluate identically per micro-batch; the full streaming
    // seam is pinned by the declared stream_semdedup oracle)
    val out = Kmeans.semProbeStream(queries, "vec_id", "embedding", m,
        members, minCosine = 0.999999).collect()
      .map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Long]("n_dups"), Option(r.get(2)))).toMap
    for (i <- 0L until 3L) {
      assert(out(i + 500L)._1 >= 1L, s"copy of $i not flagged")
      assert(out(i + 500L)._2 === Some(i), s"first_dup of copy $i wrong")
    }
    assert(out(600L) === ((0L, None)), "negated vector must be clean")
  }

  test("semDedup drops planted exact copies, keeps everything else") {
    val base = cloud(20).select(col("vec_id"), col("embedding"))
    val copies = base.where(col("vec_id") < 4)
      .select((col("vec_id") + 1000L).as("vec_id"), col("embedding"))
    val out = Kmeans.semDedup(base.unionByName(copies), "vec_id",
      "embedding", k = 2, iters = 3, minCosine = 0.999999).collect()
    assert(out.length === 24)
    val byId = out.map(r => r.getAs[Long]("vec_id") -> r).toMap
    for (i <- 0L until 4L) {
      // copy pairs share a component rooted and kept at the original
      // (equal centroid distance -> id tie-break)
      assert(byId(i + 1000L).getAs[Long]("root") === byId(i).getAs[Long]("root"))
      assert(byId(i).getAs[Boolean]("keep"))
      assert(!byId(i + 1000L).getAs[Boolean]("keep"))
      assert(byId(i + 1000L).getAs[Long]("keeper") === i)
    }
    // unduplicated vectors are their own singleton components
    for (i <- 4L until 20L) {
      assert(byId(i).getAs[Long]("root") === i)
      assert(byId(i).getAs[Boolean]("keep"))
    }
    assert(out.count(_.getAs[Boolean]("keep")) === 20)
  }

  test("semDedupBanded matches the exact path's keep decision on planted copies") {
    // the Σ|cluster|² scale path: banding by sign-LSH signatures inside
    // clusters — exact copies share every band signature, so their
    // recovery is deterministic and the keep decision must equal
    // semDedup's; organic cosines in the fixture sit far below the cut,
    // so neither path has near-threshold pairs to disagree on
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val copies = emb.where(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 50000L).as("vec_id"), col("embedding"))
    val corpus = emb.unionByName(copies).localCheckpoint(true)
    val cols = Seq("vec_id", "cluster", "root", "keeper", "keep")
    val exact = Kmeans.semDedup(corpus, "vec_id", "embedding", k = 8,
      iters = 1, minCosine = 0.9, fast = true)
      .select(cols.map(col): _*).collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue(), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toSet
    val banded = Kmeans.semDedupBanded(corpus, "vec_id", "embedding",
      k = 8, iters = 1, minCosine = 0.9, bits = 12, bands = 4)
      .select(cols.map(col): _*).collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue(), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toSet
    assert(banded == exact, "banded path diverged from the exact path")
    // and the decision is the right one: every planted copy dropped with
    // its original as keeper
    val byId = banded.map(t => t._1 -> t).toMap
    copies.select("vec_id").as[Long].collect().foreach { cid =>
      assert(!byId(cid)._5 && byId(cid)._4 == cid - 50000L,
        s"copy $cid must drop with keeper ${cid - 50000L}")
    }
  }

  test("NearestCentroidDecimal ≡ the relational decimal assignment " +
      "pipeline it replaced (r16)") {
    // the r16 row-local assignment must reproduce the pre-r16
    // posexplode → broadcast-join-on-dim → decimal-SUM groupBy →
    // per-id window pipeline BIT-FOR-BIT on real data (this is the op
    // sequence the DuckDB oracle replays): rebuild the relational form
    // inline as the reference and diff the full (id, cluster, dist2)
    // assignment on the sf0.001 embeddings fixture against the model's
    // trained centroids
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val m = Kmeans.train(emb, "vec_id", "embedding", k = 8, iters = 2)
    def r6p(c: org.apache.spark.sql.Column) =
      floor(c * 1000000.0 + 0.5) / 1000000.0
    val cdf = {
      val rows = for {
        cl <- m.cents.indices; j <- m.cents(cl).indices
      } yield (cl.toLong, j, m.cents(cl)(j))
      rows.toDF("_cl", "dim", "_c")
    }
    val ex = emb.select(col("vec_id").cast("long").as("_kid"),
      posexplode(col("embedding").cast("array<double>"))
        .as(Seq("dim", "_x")))
    val d2 = ex.join(broadcast(cdf), "dim")
      .groupBy(col("_kid"), col("_cl"))
      .agg(r6p(sum(((col("_x") - col("_c")) * (col("_x") - col("_c")))
        .cast(DecimalType(38, 12))).cast("double")).as("dist2"))
    val w = Window.partitionBy(col("_kid")).orderBy(col("dist2"), col("_cl"))
    val relational = d2.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .select(col("_kid"), col("_cl"), col("dist2")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val rowLocal = Kmeans.assignFinal(emb, "vec_id", "embedding", m)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rowLocal == relational,
      "row-local decimal assignment diverged from the relational pipeline")
  }

  test("Similarity.nearestCentroid (row-local) ≡ relational reference " +
      "on the embeddings fixture (r16)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def r6p(c: org.apache.spark.sql.Column) =
      floor(c * 1000000.0 + 0.5) / 1000000.0
    val cents = Similarity.meanVectorByKey(emb, "label", "embedding")
      .select(col("label").as("_ckey"), col("dim"), col("mean"))
    val ex = emb.withColumn("embedding",
        col("embedding").cast("array<double>"))
      .select(col("vec_id"), posexplode(col("embedding"))
        .as(Seq("dim", "_x")))
    val d2 = ex.join(broadcast(cents), "dim")
      .groupBy(col("vec_id"), col("_ckey"))
      .agg(r6p(sum(((col("_x") - col("mean")) * (col("_x") - col("mean")))
        .cast(DecimalType(38, 12))).cast("double")).as("dist2"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("dist2"), col("_ckey"))
    val relational = d2.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .select(col("vec_id"), col("_ckey").cast("long").as("assigned"),
        col("dist2")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val rowLocal = Similarity.nearestCentroid(emb, "vec_id", "label",
        "embedding").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rowLocal == relational,
      "row-local nearestCentroid diverged from the relational pipeline")
  }
}
