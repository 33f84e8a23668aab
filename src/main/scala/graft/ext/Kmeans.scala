package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** In-engine Lloyd k-means over an embedding corpus, with the exactness
  * discipline that makes iterative float training replayable by a DuckDB
  * oracle (the [[QualityModel]] generated-oracle pattern applied to
  * clustering), plus SemDeDup-style semantic deduplication on top
  * (Abbas et al., "SemDeDup: Data-efficient learning at web-scale
  * through semantic deduplication", 2023).
  *
  * == Exact float discipline (why clustering is reproducible) ==
  *
  * Every cross-row aggregation in a Lloyd round is EXACT decimal
  * arithmetic, so it is order- and partition-invariant:
  *
  *  - distances accumulate the IEEE `(x − c)²` terms as DECIMAL(38,12)
  *    (each term is one correctly-rounded double op, cast to decimal by
  *    the engines' agreed half-up rule — the [[Similarity.nearestCentroid]]
  *    discipline), are cast back to double and 6-dp-rounded with the
  *    portable `floor(x·1e6 + 0.5)/1e6` op sequence BEFORE the argmin,
  *    so the assignment decision is bit-stable across engines;
  *  - centroid updates sum the raw components as DECIMAL(38,12)
  *    (float32 inputs widened to double are exact there — the
  *    [[Similarity.meanVectorByKey]] rule), take ONE correctly-rounded
  *    IEEE division by the member count, and snap onto the same 6-dp
  *    grid, so the next round's centroids are identical doubles on any
  *    engine;
  *  - seeds are the vectors of the k smallest ids, components snapped to
  *    the 6-dp grid — deterministic, no RNG.
  *
  * A DuckDB SQL replay of all `iters` rounds (4 CTEs per round —
  * distance, argmin, update, carry-forward) therefore lands on the
  * bit-identical centroids and assignment, and the driver's hash gate
  * pins the whole training loop, not just a final score.
  *
  * == Scale shape ==
  *
  * The working set is the cached (id, vector) frame. Each round is ONE
  * job: the row-local [[graft.functions.NearestCentroidDecimal]] argmin
  * labels every vector inside the scan stage (exact decimal sums are
  * order-free, so nothing about the exactness discipline needs a
  * shuffle), posexplode feeds a map-side-combinable (cluster, dim) hash
  * aggregate, and k·d rows reach the driver (update) — driver traffic
  * O(k·d·iters) doubles, independent of corpus size, the
  * [[QualityModel.trainLogReg]] contract. The pre-r16 formulation built
  * the same decimal sums relationally (posexplode → broadcast join on
  * dim → N·k-group aggregate → per-id window) and paid two exchanges +
  * an N-keyed update join per round for arithmetic a row can do alone;
  * the r16 rewrite is bit-identical (KmeansSpec pins it against the
  * relational reference) and leaves one narrow aggregate per round.
  * Empty clusters keep their previous centroid (no re-seed RNG). At
  * 100 TB the same loop runs with k in the thousands: the centroid
  * matrix rides as a task reference (or broadcast via the trainFastBcast
  * twin), and the per-round shuffle is one narrow aggregate — the
  * canonical distributed-Lloyd layout.
  */
object Kmeans {

  /** Portable 6-dp half-up round (column form): floor(x·1e6 + 0.5)/1e6 —
    * the same IEEE op sequence on every engine (see [[Similarity]]). */
  private def r6p(c: Column): Column = floor(c * 1000000.0 + 0.5) / 1000000.0

  /** Driver-side twin of [[r6p]] — used to snap seed components so the
    * literal seed grid is the value the oracle's SQL computes. */
  private def r6p(x: Double): Double = math.floor(x * 1000000.0 + 0.5) / 1000000.0

  /** Trained model: k × d centroid components on the 6-dp grid, cluster
    * index = rank of the seed vector's id. */
  final case class Model(cents: Array[Array[Double]])

  /** k·d centroid frame (cluster, dim, component) from driver arrays. */
  private def centLong(spark: SparkSession, cents: Array[Array[Double]]): DataFrame = {
    import spark.implicits._
    val rows = for {
      cl <- cents.indices
      j <- cents(cl).indices
    } yield (cl.toLong, j, cents(cl)(j))
    rows.toDF("_cl", "dim", "_c")
  }

  /** Public (cluster, dim, c) frame of a trained model. */
  def centroidFrame(spark: SparkSession, m: Model): DataFrame =
    centLong(spark, m.cents)
      .select(col("_cl").as("cluster"), col("dim"), col("_c").as("c"))

  /** Exact-decimal distance + portable argmin as ONE row-local codegen'd
    * expression ([[graft.functions.NearestCentroidDecimal]]): per-term
    * double→DECIMAL(38,12) casts, exact decimal sum, 6-dp round, then
    * strict-< first-min — bit-identical to the explode → broadcast-join
    * → decimal-SUM groupBy → per-id window pipeline this replaces
    * (decimal addition is order-free, so a row-local accumulation is the
    * same value the shuffled aggregate computed), with zero exchanges
    * and zero N·k intermediate rows. Input contract (r16 ADVICE,
    * documented rather than silently assumed): vectors must be CLEAN —
    * uniform dims equal to the centroids', no null elements. Rows
    * violating it are DROPPED (the expression returns null), which is
    * STRICTER than the old relational form (a posexplode'd null element
    * or ragged tail produced a partial decimal sum and the row was still
    * assigned); every declared corpus satisfies the contract, and a
    * partial-distance assignment was never a meaningful answer anyway. */
  private def assignDecimal(df: DataFrame, idCol: String, vecCol: String,
      cents: Array[Array[Double]]): DataFrame =
    df.select(col(idCol).cast("long").as("_kid"),
        graft.functions.VectorFunctions.nearestCentroidDecimal(
          col(vecCol).cast("array<double>"), cents).as("_best"))
      .where(col("_best").isNotNull)
      .select(col("_kid"), col("_best").getField("cluster").as("_cl"),
        col("_best").getField("dist2").as("dist2"))

  /** Grid-snapped seed centroids: the k smallest-id vectors. */
  private def seedCents(df: DataFrame, idCol: String, vecCol: String,
      k: Int): Array[Array[Double]] =
    df.select(col(idCol).cast("long").as("_kid"),
        col(vecCol).cast("array<double>").as("_v"))
      .orderBy(col("_kid")).limit(k).collect()
      .map(_.getSeq[Double](1).toArray.map(r6p))

  /** Serving/throughput assignment: centroids enter the plan as LITERAL
    * arrays, each distance is a row-local left-to-right double fold, and
    * the argmin is `array_min` over (dist2, cluster) structs — zero
    * explode, zero join, zero shuffle, whole-stage codegen. This is the
    * form that scales in k: the relational [[assignFinal]] materializes
    * N·k aggregate groups (fine for the oracle-pinned k = 8 queries; the
    * audit form), while this one does O(k·d) codegen'd FLOPs per row.
    * Distances take the same portable 6-dp round before the argmin;
    * assignment is bit-stable across partitionings (row-local), though
    * near-exact distance TIES may resolve differently than the decimal
    * path — on separated data the two paths agree exactly
    * (KmeansSpec pins it on the fixture). Past k ≈ a few thousand,
    * route with an IVF shortlist ([[Similarity.nearestLists]]) before
    * the exact argmin instead of widening the literal array. */
  def assignServing(df: DataFrame, idCol: String, vecCol: String,
      m: Model): DataFrame = {
    // native codegen'd argmin loop (graft.functions.NearestCentroid):
    // the centroid matrix rides as one reference object, the per-row
    // cost is a tight primitive k×d loop, and the op sequence is
    // bit-identical to [[assignServingHof]] (spec-pinned)
    val best = graft.functions.VectorFunctions.nearestCentroidNative(
      col(vecCol).cast("array<double>"), m.cents)
    df.select(col(idCol).cast("long").as(idCol),
      best.getField("cluster").as("cluster"),
      best.getField("dist2").as("dist2"))
  }

  /** [[assignServing]] with the centroid matrix as a Spark BROADCAST
    * VARIABLE — the large-k form (r11 verdict task 4). The reference-
    * object form serializes the k×d matrix into EVERY task binary: at
    * the SemDeDup k ∝ N regime (k = 4096 at 1M → 2 MB, ~100k at web
    * scale → ~50 MB) that is per-task wire + deserialize cost across
    * thousands of tasks; a broadcast ships once per EXECUTOR and its
    * value is unwrapped once per operator instance. Identical assign
    * kernel — output bit-identical to [[assignServing]] (KmeansSpec +
    * the kmbig tier pin it at k = 4096). The caller owns the broadcast
    * lifecycle (create via `sparkSession.sparkContext.broadcast`,
    * unpersist when retired). */
  def assignServingBcast(df: DataFrame, idCol: String, vecCol: String,
      bcast: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]])
      : DataFrame = {
    val best = graft.functions.VectorFunctions.nearestCentroidBcast(
      col(vecCol).cast("array<double>"), bcast)
    df.select(col(idCol).cast("long").as(idCol),
      best.getField("cluster").as("cluster"),
      best.getField("dist2").as("dist2"))
  }

  /** Higher-order-function formulation of [[assignServing]] — kept as the
    * reference implementation (bit-identical results; the whole k×d
    * centroid matrix is ONE literal node and the argmin one nested fold,
    * so even this form stays O(1) in expression size) and for engines
    * without the native expression. ~20× slower per row than the native
    * loop (per-element lambda dispatch). */
  def assignServingHof(df: DataFrame, idCol: String, vecCol: String,
      m: Model): DataFrame = {
    val mat = typedLit(m.cents.map(_.toSeq).toSeq)
    val v = col(vecCol).cast("array<double>")
    val best = aggregate(
      sequence(lit(0), lit(m.cents.length - 1)),
      struct(lit(Double.MaxValue).as("dist2"), lit(-1L).as("cluster")),
      (acc, j) => {
        val d2 = r6p(aggregate(
          zip_with(v, element_at(mat, j + 1), (x, cc) => (x - cc) * (x - cc)),
          lit(0.0), (a, x) => a + x))
        // strict < keeps the FIRST minimum, so exact-distance ties break
        // toward the smaller cluster index like the relational argmin
        when(d2 < acc.getField("dist2"),
          struct(d2.as("dist2"), j.cast("long").as("cluster")))
          .otherwise(acc)
      })
    df.select(col(idCol).cast("long").as(idCol),
      best.getField("cluster").as("cluster"),
      best.getField("dist2").as("dist2"))
  }

  /** Lloyd training on the serving-path assignment — the production
    * trainer. Per round: one row-local literal-argmin pass (no N·k
    * blowup) + one (cluster, dim) exact-decimal hash aggregate
    * collecting k·d rows; centroid updates share [[train]]'s
    * decimal + 6-dp-grid discipline, so trained centroids remain
    * BIT-IDENTICAL across partitionings (the update is the only
    * cross-row arithmetic). Not oracle-replayable only because the
    * distance fold is double, not decimal — semantics match [[train]]
    * whenever no assignment lands on an exact distance tie. */
  def trainFast(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int): Model = {
    val vdf = df.select(col(idCol).cast("long").as("_kid"),
      col(vecCol).cast("array<double>").as("_v")).persist()
    try {
      var cents = seedCents(df, idCol, vecCol, k)
      for (_ <- 1 to iters) {
        val a = assignServing(vdf, "_kid", "_v", Model(cents))
          .select(col("_kid"), col("cluster").as("_cl"))
        val upd = vdf.join(a, "_kid")
          .select(col("_cl"), posexplode(col("_v")).as(Seq("dim", "_x")))
          .groupBy(col("_cl"), col("dim"))
          .agg(r6p(sum(col("_x").cast(DecimalType(38, 12))).cast("double")
            / count(lit(1))).as("_c"))
          .collect()
        val next = cents.map(_.clone)
        upd.foreach { r =>
          next(r.getAs[Long]("_cl").toInt)(r.getAs[Int]("dim")) =
            r.getAs[Double]("_c")
        }
        cents = next
      }
      Model(cents)
    } finally { vdf.unpersist(false): Unit }
  }

  /** [[trainFast]] with per-round BROADCAST centroids — the large-k
    * trainer. Per round: one broadcast-argmin pass + the same
    * (cluster, dim) exact-decimal aggregate; the k·d updated centroid
    * values still round-trip the driver (creating the next round's
    * broadcast requires the value driver-side — 2 MB at k=4096×d=64,
    * the standard Pregel-aggregator cadence), but task binaries stay
    * O(1) instead of O(k·d), which is what breaks first at large k.
    * Retired broadcasts are unpersisted non-blocking each round.
    * Bit-identical to [[trainFast]] (same kernel, same update
    * discipline — the kmbig tier pins it at k = 4096). */
  def trainFastBcast(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int): Model = {
    val sc = df.sparkSession.sparkContext
    val vdf = df.select(col(idCol).cast("long").as("_kid"),
      col(vecCol).cast("array<double>").as("_v")).persist()
    try {
      var cents = seedCents(df, idCol, vecCol, k)
      for (_ <- 1 to iters) {
        val bc = sc.broadcast(cents)
        val a = assignServingBcast(vdf, "_kid", "_v", bc)
          .select(col("_kid"), col("cluster").as("_cl"))
        val upd = vdf.join(a, "_kid")
          .select(col("_cl"), posexplode(col("_v")).as(Seq("dim", "_x")))
          .groupBy(col("_cl"), col("dim"))
          .agg(r6p(sum(col("_x").cast(DecimalType(38, 12))).cast("double")
            / count(lit(1))).as("_c"))
          .collect()
        val next = cents.map(_.clone)
        upd.foreach { r =>
          next(r.getAs[Long]("_cl").toInt)(r.getAs[Int]("dim")) =
            r.getAs[Double]("_c")
        }
        cents = next
        bc.unpersist(false)
      }
      Model(cents)
    } finally { vdf.unpersist(false): Unit }
  }

  /** `iters` Lloyd rounds over `df`'s `vecCol`, seeded by the k smallest
    * `idCol` vectors. Cache-once / scan-per-round; see object doc for the
    * exactness and scale contracts. */
  def train(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int): Model = {
    val vdf = df.select(col(idCol).cast("long").as("_kid"),
      col(vecCol).cast("array<double>").as("_v")).persist()
    try {
      var cents = seedCents(df, idCol, vecCol, k)
      for (_ <- 1 to iters) {
        // one job per round: the row-local decimal argmin labels each
        // vector in the scan stage, posexplode feeds the (cluster, dim)
        // exact-decimal hash aggregate (map-side combinable, k·d groups
        // collected) — the per-round explode-join/groupBy/window
        // assignment pipeline and the N-keyed update join are gone
        // the argmin projects BELOW the explode (its own select), so it
        // runs once per VECTOR — in one select with posexplode the
        // projection lands above the Generate and re-evaluates the
        // k·d decimal loop once per exploded ROW (d× the work; the first
        // cut of this rewrite measured exactly that in a thread dump)
        val upd = vdf.select(col("_v"),
            graft.functions.VectorFunctions.nearestCentroidDecimal(
              col("_v"), cents).getField("cluster").as("_cl"))
          .where(col("_cl").isNotNull)
          .select(col("_cl"), posexplode(col("_v")).as(Seq("dim", "_x")))
          .groupBy(col("_cl"), col("dim"))
          .agg(r6p(sum(col("_x").cast(DecimalType(38, 12))).cast("double")
            / count(lit(1))).as("_c"))
          .collect()
        // empty clusters keep their previous centroid (the oracle's
        // COALESCE carry-forward) — populated clusters always emit all
        // d dims, so the merge is per-cluster all-or-nothing
        val next = cents.map(_.clone)
        upd.foreach { r =>
          next(r.getAs[Long]("_cl").toInt)(r.getAs[Int]("dim")) =
            r.getAs[Double]("_c")
        }
        cents = next
      }
      Model(cents)
    } finally { vdf.unpersist(false): Unit }
  }

  /** Assignment of every vector against a trained model's (final)
    * centroids: (idCol, cluster, dist2). One row-local codegen'd
    * decimal-argmin pass — zero shuffles, no training state needed. */
  def assignFinal(df: DataFrame, idCol: String, vecCol: String,
      m: Model): DataFrame =
    assignDecimal(df, idCol, vecCol, m.cents)
      .select(col("_kid").as(idCol), col("_cl").as("cluster"), col("dist2"))

  /** Streaming SemDeDup probe — the ingest-time twin of [[semDedup]]:
    * each arriving vector is assigned its cluster ROW-LOCALLY against the
    * frozen model (the native serving argmin — no state store, no
    * shuffle before the join; the oracle replays the identical
    * left-to-right double fold as a DuckDB list comprehension, the
    * [[Similarity]] dot-product precedent, so the assignment decision is
    * bit-stable across engines), stream-static-joined to the corpus
    * members of that cluster only, and flagged when any member's cosine
    * clears `minCosine`. Emits one row per query: (query_id, n_dups,
    * first_dup — smallest duplicate member id, NULL when clean).
    *
    * `members` must be the batch frame (cluster, member_id, mv) of corpus
    * assignments + widened vectors. Scale: the join key is the cluster
    * id, so each arriving vector compares against ONE cluster's members
    * (the SemDeDup bound), and the static side partitions by cluster. */
  def semProbeStream(queries: DataFrame, idCol: String, vecCol: String,
      m: Model, members: DataFrame, minCosine: Double): DataFrame = {
    val q = queries.select(col(idCol).cast("long").as("query_id"),
        col(vecCol).cast("array<double>").as("_qv"))
      .withColumn("cluster",
        graft.functions.VectorFunctions.nearestCentroidNative(col("_qv"),
          m.cents).getField("cluster"))
    val joined = q.join(members, Seq("cluster"), "left")
      .withColumn("_cos",
        r6p(Similarity.dot(col("_qv"), col("mv"))
          / (Similarity.norm(col("_qv")) * Similarity.norm(col("mv")))))
    joined.groupBy(col("query_id"))
      .agg(sum(when(col("_cos") >= lit(minCosine), 1L).otherwise(0L))
          .as("n_dups"),
        min(when(col("_cos") >= lit(minCosine), col("member_id")))
          .as("first_dup"))
  }

  /** SemDeDup (Abbas et al. 2023): cluster the corpus, mine near-duplicate
    * pairs ONLY within clusters (cosine ≥ `minCosine` on the 6-dp portable
    * round), resolve connected components, and keep one representative per
    * component — the member CLOSEST TO ITS CLUSTER CENTROID (ties toward
    * the smaller id), the paper's "low distance to centroid" keep rule.
    * Emits one row per vector: (idCol, cluster, root, keeper, keep).
    *
    * Scale shape: clustering bounds the pair search — candidates join on
    * the cluster key, so pair work is Σ|cluster|², controlled by k (pick
    * k ∝ N / target-cluster-size; the paper uses ~100k clusters at
    * web scale), never the corpus square. Components resolve with
    * [[Dedup.dedupClusters]] (pointer-doubling, log-diameter rounds). The
    * assignment frame is checkpointed once (id, cluster, dist2 — a few
    * dozen bytes/row, not the vectors) and reused by both pair sides and
    * the output join. */
  def semDedup(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int, minCosine: Double, fast: Boolean = false): DataFrame = {
    val m = if (fast) trainFast(df, idCol, vecCol, k, iters)
            else train(df, idCol, vecCol, k, iters)
    // assignment is row-local for BOTH arithmetic paths now, so the
    // pinned frame carries the vector alongside (id, cluster, dist2) —
    // the two id-equi-joins that re-attached vectors to each pair side
    // are gone (the pair self-join on the cluster key shuffled the
    // vectors either way; now they ride the same rows one hop earlier)
    val best = {
      val v = col("_v")
      if (fast) graft.functions.VectorFunctions
        .nearestCentroidNative(v, m.cents)
      else graft.functions.VectorFunctions
        .nearestCentroidDecimal(v, m.cents)
    }
    val avf = df.select(col(idCol).cast("long").as(idCol),
        col(vecCol).cast("array<double>").as("_v"))
      .withColumn("_best", best)
      .where(col("_best").isNotNull)
      .select(col(idCol), col("_best").getField("cluster").as("cluster"),
        col("_best").getField("dist2").as("dist2"), col("_v"))
      .transform(Pin.pin)
    val af = avf.select(col(idCol), col("cluster"), col("dist2"))
    val a = avf.select(col(idCol).as("id_a"), col("cluster"),
      col("_v").as("_va"))
    val b = avf.select(col(idCol).as("id_b"), col("cluster"),
      col("_v").as("_vb"))
    val pairs = a.join(b, Seq("cluster"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        r6p(Similarity.dot(col("_va"), col("_vb"))
          / (Similarity.norm(col("_va")) * Similarity.norm(col("_vb"))))
          .as("_cos"))
      .where(col("_cos") >= lit(minCosine))
    keepFromPairs(af, idCol, pairs)
  }

  /** Shared SemDeDup tail: verified near-dup pairs → pointer-doubling
    * components → min-(dist2, id) keeper per component → per-doc keep
    * decision. */
  private def keepFromPairs(af: DataFrame, idCol: String,
      pairs: DataFrame): DataFrame = {
    val comp = Dedup.dedupClusters(pairs, "id_a", "id_b")
    val withRoot = af
      .join(comp.select(col("doc").as(idCol), col("root")), Seq(idCol), "left")
      .select(col(idCol), col("cluster"),
        coalesce(col("root"), col(idCol)).as("root"), col("dist2"))
    val wk = Window.partitionBy(col("root"))
      .orderBy(col("dist2"), col(idCol))
    val keepers = withRoot.withColumn("_rn", row_number().over(wk))
      .where(col("_rn") === 1)
      .select(col("root"), col(idCol).as("keeper"))
    withRoot.join(keepers, Seq("root"))
      .select(col(idCol), col("cluster"), col("root"), col("keeper"),
        (col(idCol) === col("keeper")).as("keep"))
  }

  /** SemDeDup SCALE PATH (r15 VERDICT task 3): [[semDedup]]'s
    * intra-cluster pair stage is Σ|cluster|² comparisons — fine at
    * survey scale, a wall once clusters carry thousands of members
    * (10M vectors at k=4096 is ~24G pair comparisons; the semdedup10m
    * tier measures the crack and this fix). Here cluster members are
    * additionally BANDED by sign-LSH hyperplane signatures and pairs
    * form only within (cluster, band, signature) buckets — the same
    * move every near-dup operator in the repo makes (MinHash/SimHash
    * bands, [[Similarity.lshBucketedPairs]]): pair work ∝ true
    * near-dups + O(1)-occupancy random collisions, never member².
    * Exact/near-exact duplicates share every band signature, so their
    * recovery is deterministic (p = 1); general pairs at cosine c are
    * caught with the OR-amplified 1 − (1 − p^bits)^bands, p = 1 − θ/π —
    * recall is the knob, and the exact-cosine verify keeps false
    * positives impossible. Keeper semantics identical to [[semDedup]]
    * (components over verified pairs, min-dist2 keeper); uses the
    * serving (IEEE-double) arithmetic — the production tier, not the
    * oracle-replay form. */
  def semDedupBanded(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int, minCosine: Double, bits: Int = 12,
      bands: Int = 8): DataFrame = {
    val m = trainFast(df, idCol, vecCol, k, iters)
    val af = assignServing(df, idCol, vecCol, m).transform(Pin.pin)
    val vecs = df.select(col(idCol).cast("long").as("_vid"),
      col(vecCol).cast("array<double>").as("_v"))
    // signature rows stay NARROW (id, cluster, band, sig — no vector):
    // the band self-join shuffles bands·n fixed-width rows, and only the
    // deduped CANDIDATES ever see the vectors again (two id-equi-joins),
    // so shuffle bytes are linear in rows however large Σ|cluster|² got
    val sigs = Pin.pin(af.select(col(idCol), col("cluster"))
      .join(vecs.select(col("_vid").as(idCol), col("_v")), Seq(idCol))
      .select(col(idCol), col("cluster"),
        posexplode(array((0 until bands).map(b =>
          graft.functions.VectorFunctions
            .hyperplaneSig(col("_v"), bits, b.toLong)): _*)))
      .toDF(idCol, "cluster", "band", "sig"))
    val cand = sigs.as("a").join(sigs.as("b"),
        col("a.cluster") === col("b.cluster") &&
          col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val pairs = cand
      .join(vecs.select(col("_vid").as("id_a"), col("_v").as("_va")), "id_a")
      .join(vecs.select(col("_vid").as("id_b"), col("_v").as("_vb")), "id_b")
      .select(col("id_a"), col("id_b"),
        r6p(Similarity.dot(col("_va"), col("_vb"))
          / (Similarity.norm(col("_va")) * Similarity.norm(col("_vb"))))
          .as("_cos"))
      .where(col("_cos") >= lit(minCosine))
    keepFromPairs(af, idCol, pairs)
  }

  /** DuckDB replay of [[train]] + [[assignFinal]]: the shared CTE prefix.
    * `eSql` must produce `(vec_id, v DOUBLE[])` for the same input frame
    * the engine clusters. Ends with `c$iters` (final centroids, columns
    * cl/dim/cv) and `af` (final assignment, columns vec_id/cl/dist2).
    * Set `recursive` when the caller appends recursive CTEs. */
  def oracleCtes(k: Int, iters: Int, eSql: String,
      recursive: Boolean = false): String = {
    val sb = new StringBuilder
    val rec = if (recursive) "RECURSIVE " else ""
    sb.append(
      s"""WITH ${rec}e AS MATERIALIZED ($eSql),
         |x AS MATERIALIZED (SELECT vec_id,
         |    unnest([{'dim': i - 1, 'val': v[i]}
         |            for i in generate_series(1, len(v))]) AS u
         |  FROM e),
         |seed AS MATERIALIZED (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cl, vec_id
         |  FROM (SELECT vec_id FROM e ORDER BY vec_id LIMIT $k)),
         |c0 AS MATERIALIZED (
         |  SELECT s.cl, x.u.dim AS dim,
         |    floor(x.u.val * 1000000.0 + 0.5) / 1000000.0 AS cv
         |  FROM seed s JOIN x ON s.vec_id = x.vec_id)""".stripMargin)
    for (i <- 1 to iters) {
      val p = i - 1
      sb.append(s""",
         |d$i AS MATERIALIZED (
         |  SELECT x.vec_id, c.cl,
         |    floor(CAST(SUM(CAST((x.u.val - c.cv) * (x.u.val - c.cv)
         |        AS DECIMAL(38,12))) AS DOUBLE) * 1000000.0 + 0.5)
         |      / 1000000.0 AS dist2
         |  FROM x JOIN c$p c ON x.u.dim = c.dim GROUP BY 1, 2),
         |a$i AS MATERIALIZED (
         |  SELECT vec_id, cl, dist2 FROM (
         |    SELECT vec_id, cl, dist2, row_number() OVER (
         |      PARTITION BY vec_id ORDER BY dist2, cl) AS rn FROM d$i)
         |  WHERE rn = 1),
         |u$i AS MATERIALIZED (
         |  SELECT a.cl, x.u.dim AS dim,
         |    floor((CAST(SUM(CAST(x.u.val AS DECIMAL(38,12))) AS DOUBLE)
         |        / COUNT(*)) * 1000000.0 + 0.5) / 1000000.0 AS cv
         |  FROM x JOIN a$i a USING (vec_id) GROUP BY 1, 2),
         |c$i AS MATERIALIZED (
         |  SELECT p.cl, p.dim, COALESCE(u.cv, p.cv) AS cv
         |  FROM c$p p LEFT JOIN u$i u ON p.cl = u.cl AND p.dim = u.dim)""".stripMargin)
    }
    sb.append(s""",
       |dfin AS MATERIALIZED (
       |  SELECT x.vec_id, c.cl,
       |    floor(CAST(SUM(CAST((x.u.val - c.cv) * (x.u.val - c.cv)
       |        AS DECIMAL(38,12))) AS DOUBLE) * 1000000.0 + 0.5)
       |      / 1000000.0 AS dist2
       |  FROM x JOIN c$iters c ON x.u.dim = c.dim GROUP BY 1, 2),
       |af AS MATERIALIZED (
       |  SELECT vec_id, cl, dist2 FROM (
       |    SELECT vec_id, cl, dist2, row_number() OVER (
       |      PARTITION BY vec_id ORDER BY dist2, cl) AS rn FROM dfin)
       |  WHERE rn = 1)""".stripMargin)
    sb.toString
  }
}
