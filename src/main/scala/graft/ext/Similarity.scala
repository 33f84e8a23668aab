package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search over an `array<float>` column.
  *
  * Numeric discipline (for engine-portable determinism): embeddings are
  * widened float→double (exact), dot products are sequential left-to-right
  * array folds — bit-identical to DuckDB's list arithmetic — and
  * similarities are rounded before ranking so top-k cuts are stable across
  * engines and partitionings.
  */
object Similarity {

  /** Sequential dot product of two double arrays. Backed by the native
    * codegen'd [[graft.functions.DotProduct]] expression (same
    * left-to-right IEEE order as the HOF fold below, ~20× faster). */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dotNative(a, b)

  /** Higher-order-function formulation of [[dot]] — kept as the reference
    * implementation (bit-identical results) and for engines without the
    * native expression. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two `array<double>` columns. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn(vecCol, col(vecCol).cast("array<double>"))

  /** Brute-force cosine top-k: for each query vector, the k most similar
    * non-identical candidates. The query side is broadcast (queries are
    * few); the candidate scan streams — at cluster scale this is one pass
    * over the corpus with no shuffle except the final per-query top-k,
    * which `rank <= k` reduces to k rows per query before the sort. */
  def cosineTopK(candidates: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, roundScale: Int = 6): DataFrame = {
    // norms once per vector (not per pair); dot/(nq*nc) is the identical
    // IEEE op sequence to cosine(q, c), just with the norms hoisted.
    // cache() forces a materialization boundary — otherwise CollapseProject
    // folds the norm into the post-join projection and recomputes it per
    // pair (observed 3× dot work in the executed plan)
    // repartition: a single-file corpus otherwise scans as ONE task and the
    // whole scoring pass runs on one core
    val c = asDouble(candidates, vecCol).withColumn("_cn", norm(col(vecCol)))
      .repartition(col(idCol)).cache()
    val q = asDouble(queries, vecCol)
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
        norm(col(vecCol)).as("_qn"))
    val scored = c.crossJoin(broadcast(q))
      .where(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("candidate_id"),
        round(dot(col("qvec"), col(vecCol)) / (col("_qn") * col("_cn")),
          roundScale).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("candidate_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Brute-force global top-N most similar pairs (a < b).
    *
    * Pair generation is a block-partitioned EQUI-join, not a θ-join: ids
    * hash into B blocks, the B(B+1)/2 unordered block pairs drive two hash
    * joins, and each unordered id pair surfaces exactly once (cross-block
    * pairs once by construction; same-block pairs deduped by id order).
    * Unlike `a JOIN b ON id_a < id_b` — a nested-loop join that degrades
    * to few, uneven tasks — this stays in codegen'd hash-join machinery
    * with B(B+1)/2-way parallelism and uniform task sizes, which is also
    * the shape that scales out. Cosine is symmetric bit-exactly (products
    * commute, summation order equal), so canonicalizing id order after the
    * join does not change values. */
  def topPairs(df: DataFrame, idCol: String, vecCol: String, topN: Int,
      roundScale: Int = 6, blocks: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // cache: materialization boundary so per-vector norms aren't collapsed
    // into the per-pair projection
    val d = asDouble(df, vecCol).withColumn("_n", norm(col(vecCol))).cache()
    val blockPairs = broadcast(
      (for { i <- 0 until blocks; j <- i until blocks } yield (i, j))
        .toDF("_ba", "_bb"))
    val a = d.select(col(idCol).as("id_a"), col(vecCol).as("va"), col("_n").as("_na"))
      .withColumn("_ba", pmod(xxhash64(col("id_a")), lit(blocks.toLong)).cast("int"))
    val b = d.select(col(idCol).as("id_b"), col(vecCol).as("vb"), col("_n").as("_nb"))
      .withColumn("_bb", pmod(xxhash64(col("id_b")), lit(blocks.toLong)).cast("int"))
    a.join(blockPairs, Seq("_ba"))
      .join(b, Seq("_bb"))
      .where(col("_ba") < col("_bb") || col("id_a") < col("id_b"))
      .select(
        least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"),
        round(dot(col("va"), col("vb")) / (col("_na") * col("_nb")),
          roundScale).as("cosine"))
      .orderBy(col("cosine").desc, col("id_a"), col("id_b"))
      .limit(topN)
  }

  /** Random-hyperplane LSH signature: `bits` sign bits packed into a long.
    * Hyperplanes are pseudo-random unit-free vectors derived from
    * xxhash64(bit, dim) — deterministic, no stored model. */
  def hyperplaneSignature(df: DataFrame, idCol: String, vecCol: String,
      bits: Int = 16): DataFrame = {
    val d = asDouble(df, vecCol)
    val dims = size(col(vecCol))
    // bit index is a compile-time constant: unroll the projections
    val sigBits: Seq[Column] = (0 until bits).map { b =>
      val proj = aggregate(
        zip_with(col(vecCol),
          transform(sequence(lit(0), dims - 1),
            i => (pmod(xxhash64(lit(b), i), lit(2001L)) - 1000L).cast("double") / 1000.0),
          (x, h) => x * h),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L << b)).otherwise(lit(0L))
    }
    d.select(col(idCol), col(vecCol),
      sigBits.reduce((a, b) => a.bitwiseOR(b)).as("lsh_sig"))
  }

  /** LSH-bucketed approximate pair search: only pairs sharing a signature
    * bucket are scored. The scale path for near-dup mining: shuffle is on
    * 64-bit bucket keys, candidate verification is bucket-local. Recall
    * depends on `bits` vs the similarity threshold (fewer bits = higher
    * recall, bigger buckets). */
  def lshBucketedPairs(df: DataFrame, idCol: String, vecCol: String,
      minCosine: Double, bits: Int = 12, roundScale: Int = 6): DataFrame = {
    val sig = hyperplaneSignature(df, idCol, vecCol, bits)
    sig.as("a").join(sig.as("b"),
        col("a.lsh_sig") === col("b.lsh_sig") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        round(cosine(col(s"a.$vecCol"), col(s"b.$vecCol")), roundScale).as("cosine"))
      .where(col("cosine") >= minCosine)
  }

  /** Mini-batch-free k-means over the embedding column, expressed entirely
    * in DataFrame ops: deterministic seeding (k vectors in xxhash64(id)
    * order), then `iters` rounds of assign (broadcast centroids, argmin
    * squared L2) + recompute (per-dimension mean via posexplode — one hash
    * aggregate on (list, dim)). Centroid frames are O(k·dims); the per-
    * iteration cost is one pass over the corpus — the standard IVF
    * index-build shape. Returns (list, centroid array<double>). */
  def learnCentroids(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 3): DataFrame = {
    val d = asDouble(df, vecCol).select(col(idCol).as("_id"), col(vecCol).as("_v")).cache()
    val seeds = d
      .withColumn("_rnk", row_number().over(
        Window.orderBy(xxhash64(col("_id")), col("_id"))))
      .where(col("_rnk") <= k)
      .select((col("_rnk") - 1).cast("int").as("list"), col("_v").as("c"))
    (1 to iters).foldLeft(seeds) { (cents, _) =>
      val assigned = assignToNearest(
        d.withColumnRenamed("_v", "v"), "_id", "v", cents)
      assigned.select(col("list"), posexplode(col("v")))
        .groupBy(col("list"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .groupBy(col("list"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("list"),
          transform(col("pm"), x => x.getField("m")).as("c"))
    }
  }

  /** Assign each row's vector to the nearest centroid (argmin squared L2 =
    * argmin(c·c − 2 v·c); tie-break on list id). Adds a `list` column;
    * one row per input row (partitioned by the row id). */
  private def assignToNearest(d: DataFrame, idColName: String, vecCol: String,
      centroids: DataFrame): DataFrame = {
    val scored = d.crossJoin(broadcast(
        centroids.select(col("list"), col("c"),
          dot(col("c"), col("c")).as("_cc"))))
      .withColumn("_score", col("_cc") - lit(2.0) * dot(col(vecCol), col("c")))
    val w = Window.partitionBy(col(idColName)).orderBy(col("_score"), col("list"))
    scored.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_score", "_cc", "_rn", "c")
  }

  /** IVF top-k with learned centroids: build the k-means index, assign the
    * corpus once, probe each query's `nProbe` nearest lists. Scan fraction
    * ≈ nProbe/nLists. */
  def ivfTopKLearned(candidates: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nLists: Int = 16, nProbe: Int = 4,
      iters: Int = 3, roundScale: Int = 6): DataFrame = {
    val cents = learnCentroids(candidates, idCol, vecCol, nLists, iters).cache()
    val c = assignToNearest(
      asDouble(candidates, vecCol).withColumn("_cn", norm(col(vecCol))),
      idCol, vecCol, cents)
    val qBase = asDouble(queries, vecCol)
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
        norm(col(vecCol)).as("_qn"))
    val qProbes = qBase.crossJoin(broadcast(
        cents.select(col("list"), col("c"), dot(col("c"), col("c")).as("_cc"))))
      .withColumn("_score", col("_cc") - lit(2.0) * dot(col("qvec"), col("c")))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("_score"), col("list"))))
      .where(col("_rn") <= nProbe)
      .select(col("query_id"), col("qvec"), col("_qn"), col("list"))
    val scored = c.join(broadcast(qProbes), Seq("list"))
      .where(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("candidate_id"),
        round(dot(col("qvec"), col(vecCol)) / (col("_qn") * col("_cn")),
          roundScale).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("candidate_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** IVF-style two-stage search: partition vectors into `nLists` buckets by
    * nearest pseudo-random centroid (deterministic, derived like the LSH
    * hyperplanes), then search only the query's `nProbe` nearest lists.
    * Trades recall for a `nProbe/nLists` scan fraction — the 100 TB path
    * when queries are many. */
  def ivfTopK(candidates: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nLists: Int = 16, nProbe: Int = 4,
      roundScale: Int = 6): DataFrame = {
    val c = asDouble(candidates, vecCol)
    val q = asDouble(queries, vecCol)
    val dims = size(col(vecCol))
    def centroidScores: Column =
      transform(sequence(lit(0), lit(nLists - 1)), cIdx => struct(
        cIdx.as("list"),
        aggregate(
          zip_with(col(vecCol),
            transform(sequence(lit(0), dims - 1),
              i => (pmod(xxhash64(lit(7L), cIdx, i), lit(2001L)) - 1000L).cast("double") / 1000.0),
            (x, h) => x * h),
          lit(0.0), (acc, x) => acc + x).as("score")))
    // candidates go to their single best list
    val cAssigned = c.withColumn("list",
      aggregate(centroidScores, struct(lit(-1).as("list"), lit(Double.MinValue).as("score")),
        (best, s) => when(s.getField("score") > best.getField("score"), s).otherwise(best))
        .getField("list"))
    // queries probe their nProbe best lists
    val qProbes = q.withColumn("probes",
        slice(array_sort(centroidScores,
          (l, r) => when(l.getField("score") > r.getField("score"), -1)
            .when(l.getField("score") < r.getField("score"), 1).otherwise(0)), 1, nProbe))
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
        explode(col("probes").getField("list")).as("list"))
    val scored = cAssigned.join(broadcast(qProbes), Seq("list"))
      .where(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("candidate_id"),
        round(cosine(col("qvec"), col(vecCol)), roundScale).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("candidate_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
