package graft

import graft.ext.{Dedup, Multimodal, Similarity}
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** Extension-operator semantics: LSH paths must agree with their exact
  * counterparts on real data; native expressions must be bit-identical to
  * their HOF reference formulations. */
class ExtSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = spark.read.parquet(sf("documents")).cache()
  lazy val emb = spark.read.parquet(sf("embeddings")).cache()

  test("minhash-LSH near-dup pairs == exact jaccard pairs on sf0.001") {
    val sh = Dedup.hashedShingles(docs, "doc_id", "text", 3)
    val exact = Dedup.jaccardPairs(sh, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashDupPairs(docs, "doc_id", "text", 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    assert(lsh == exact)
  }

  test("simhash flags the planted near-dups with small hamming distance") {
    val sh = Dedup.hashedShingles(docs, "doc_id", "text", 3)
    val planted = Dedup.jaccardPairs(sh, 0.9)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val sim = Dedup.simhashDupPairs(docs, "doc_id", "text", maxDist = 7)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // every planted textual near-dup is a simhash near-dup (banding is
    // exact for hamming <= 7; planted pairs measure <= 7 on this fixture)
    assert(planted.nonEmpty && planted.subsetOf(sim))
  }

  test("exact dedup keeps deterministic keeper with count") {
    val dup = docs.select(col("doc_id"), lit("same").as("text"))
    val out = Dedup.exact(dup, Seq("text"), "doc_id")
    val (keeper, n) = out.select("doc_id", "n_copies").as[(Long, Long)].head()
    assert(keeper == 0L && n == docs.count())
  }

  test("native dot product is bit-identical to the HOF fold") {
    val pairs = emb.limit(50).select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .crossJoin(emb.limit(50).select(col("vec_id").as("vid2"),
        col("embedding").cast("array<double>").as("w")))
    val diff = pairs.select(
        (VectorFunctions.dotNative(col("v"), col("w")) -
          Similarity.dotHof(col("v"), col("w"))).as("d"))
      .agg(max(abs(col("d")))).as[Double].head()
    assert(diff == 0.0)
  }

  test("sortedIntersectCount matches array_intersect on sorted arrays") {
    val df = Seq(
      (Seq(1L, 3L, 5L, 7L), Seq(3L, 4L, 5L, 9L)),
      (Seq(1L, 2L), Seq(3L, 4L)),
      (Seq.empty[Long], Seq(1L)),
      (Seq(1L, 1L, 2L), Seq(1L, 2L))).toDF("a", "b")
    val out = df.select(
      VectorFunctions.sortedIntersectCount(col("a"), col("b")).as("n"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("m"))
      .as[(Long, Long)].collect()
    // distinct-element arrays agree; (dup case counts pairwise matches)
    assert(out(0) == ((2L, 2L)))
    assert(out(1) == ((0L, 0L)))
    assert(out(2) == ((0L, 0L)))
  }

  test("cosineTopK rank-1 is the true nearest neighbour (vs brute force)") {
    val topk = Similarity.cosineTopK(emb, emb.where(col("vec_id") < 3),
      "vec_id", "embedding", k = 1)
      .select("query_id", "candidate_id").as[(Long, Long)].collect().toMap
    // brute force via pair scores
    val e = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val brute = e.as("q").join(e.as("c"),
        col("q.vec_id") < 3 && col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("q"), col("c.vec_id").as("c"),
        (VectorFunctions.dotNative(col("q.v"), col("c.v")) /
          (sqrt(VectorFunctions.dotNative(col("q.v"), col("q.v"))) *
            sqrt(VectorFunctions.dotNative(col("c.v"), col("c.v"))))).as("s"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q")
          .orderBy(col("s").desc, col("c"))))
      .where(col("rn") === 1)
      .select("q", "c").as[(Long, Long)].collect().toMap
    assert(topk == brute)
  }

  test("LSH-bucketed pair search finds high-cosine pairs it buckets together") {
    val out = Similarity.lshBucketedPairs(emb, "vec_id", "embedding",
      minCosine = -1.0, bits = 4)
    // 4 bits -> 16 buckets over 500 vectors: must produce pairs, all scored
    assert(out.count() > 0)
    assert(out.where(col("cosine").isNull).count() == 0)
  }

  test("ivfTopK returns k ranked rows per query") {
    val out = Similarity.ivfTopK(emb, emb.where(col("vec_id") < 2),
      "vec_id", "embedding", k = 3, nLists = 8, nProbe = 8)
    val got = out.groupBy("query_id").agg(count(lit(1)).as("n"))
      .select("n").as[Long].collect()
    // probing all lists == exhaustive: exactly k per query
    assert(got.toSeq == Seq(3L, 3L))
  }

  test("multimodal plumbing: ingest -> decode stub -> features, row counts preserved") {
    implicit val s = spark
    import s.implicits._
    val media = Multimodal.asMedia(docs.limit(20), "doc_id", "text", "source")
      .as[Multimodal.MediaRow]
    val decoded = Multimodal.decode(media)
    val feats = Multimodal.extractFeatures(decoded, dims = 8).collect()
    assert(feats.length == 20)
    assert(feats.forall(_.features.length == 8))
    val resized = Multimodal.resize(decoded, 224, 224).collect()
    assert(resized.forall(r => r.meta.width == 224 && r.meta.height == 224))
    // deterministic stubs: same input -> same features
    val again = Multimodal.extractFeatures(Multimodal.decode(media), dims = 8).collect()
    assert(feats.sortBy(_.doc_id).zip(again.sortBy(_.doc_id))
      .forall { case (x, y) => x.features.sameElements(y.features) })
  }
}
