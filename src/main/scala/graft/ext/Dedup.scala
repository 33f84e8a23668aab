package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale text pipelines. All operators
  * are pure DataFrame compositions (hash aggregates + equi-joins on
  * short keys) — no UDFs, no driver-side loops — so they distribute and
  * AQE/skew-join handling applies at 100 TB.
  *
  * Scale notes: exact dedup is one hash aggregate on the dedup key (never
  * a window over the full row). MinHash-LSH reduces the pairwise problem
  * from O(n²) to O(n·b) band-bucket joins; candidate verification touches
  * only bucket-colliding pairs. Shingle joins carry only (id, shingle-hash)
  * pairs — fixed-width rows — not document text.
  */
object Dedup {

  /** Exact dedup: one surviving row id per distinct key, deterministic
    * keeper = min id. `SELECT min(id), count(*) GROUP BY key` — map-side
    * partial aggregation, one shuffle on the key hash. */
  def exact(df: DataFrame, keyCols: Seq[String], idCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** Distinct word n-gram shingles per document: (id, shingle). */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val words = split(col(textCol), " ")
    val idxs = when(size(words) >= n, sequence(lit(0), size(words) - n))
      .otherwise(array().cast("array<int>"))
    df.select(col(idCol).as("doc"),
        explode(array_distinct(
          transform(idxs, i => concat_ws(" ", slice(words, i + 1, lit(n)))))).as("shingle"))
      .where(col("shingle") =!= "")
  }

  /** Exact pairwise n-gram Jaccard over a shingle frame; emits pairs with
    * similarity >= minJ (doc_a < doc_b). The shingle equi-join only pairs
    * documents that share at least one shingle — already sub-quadratic on
    * real corpora; for planet-scale use [[minhashDupPairs]]. */
  def jaccardPairs(sh: DataFrame, minJ: Double): DataFrame = {
    val counts = sh.groupBy(col("doc")).agg(count(lit(1)).as("n"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(counts.withColumnRenamed("doc", "doc_a").withColumnRenamed("n", "na"), "doc_a")
      .join(counts.withColumnRenamed("doc", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
      .withColumn("jaccard",
        col("i").cast("double") / (col("na") + col("nb") - col("i")))
      .where(col("jaccard") >= minJ)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** MinHash signatures: numHashes permutations approximated by seeded
    * xxhash64 of the shingle; signature[i] = min over shingles. One hash
    * aggregate per document (all mins computed in one pass). */
  def minhashSignatures(sh: DataFrame, numHashes: Int = 64): DataFrame = {
    val mins: Seq[Column] = (0 until numHashes).map { i =>
      min(xxhash64(lit(i), col("shingle"))).as(s"h$i")
    }
    sh.groupBy(col("doc")).agg(mins.head, mins.tail: _*)
      .select(col("doc"), array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** LSH banding: signature rows are grouped into `bands` bands of
    * `rowsPerBand`; documents colliding on any full band become candidate
    * pairs. Join key is (band_id, band_hash) — short and uniformly
    * distributed, so the shuffle is balanced. */
  def lshCandidates(sig: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val banded = sig.select(col("doc"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(b, slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))))))
      .toDF("doc", "band", "bandhash")
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bandhash") === col("b.bandhash") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .distinct()
  }

  /** MinHash-LSH near-dup detection with exact-Jaccard verification of the
    * candidate set: LSH prunes the pair space; the final filter computes
    * true Jaccard only for colliding pairs, so output = exact pairs subject
    * to LSH recall (with 64 hashes / 16 bands × 4 rows, miss probability at
    * j >= 0.8 is ~2e-4; at the planted-dup level j >= 0.9 it is < 1e-9). */
  def minhashDupPairs(df: DataFrame, idCol: String, textCol: String,
      minJ: Double, n: Int = 3, numHashes: Int = 64, bands: Int = 16): DataFrame = {
    val sh = shingles(df, idCol, textCol, n).cache()
    val cand = lshCandidates(minhashSignatures(sh, numHashes), bands, numHashes / bands)
    val counts = sh.groupBy(col("doc")).agg(count(lit(1)).as("n"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .agg(count(lit(1)).as("i"))
      .join(cand, Seq("doc_a", "doc_b"), "left_semi")
    inter
      .join(counts.withColumnRenamed("doc", "doc_a").withColumnRenamed("n", "na"), "doc_a")
      .join(counts.withColumnRenamed("doc", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
      .withColumn("jaccard",
        col("i").cast("double") / (col("na") + col("nb") - col("i")))
      .where(col("jaccard") >= minJ)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** 64-bit SimHash over whitespace tokens, computed row-locally with
    * array folds (no explode, no shuffle): per bit, sign of Σ ±1 over
    * token hashes. Near-dup = small Hamming distance; pair generation via
    * 16-bit chunk banding (any equal chunk → candidate), same LSH shape as
    * MinHash banding. */
  def simhash64(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = split(col(textCol), " ")
    val hashes = transform(toks, t => xxhash64(t))
    // per bit i: sign of Σ tokens (bit i set ? +1 : -1); bit index is a
    // compile-time constant, so the 64 folds unroll at plan-build time
    val bits: Seq[Column] = (0 until 64).map { i =>
      val s = aggregate(hashes, lit(0L),
        (acc, h) => acc +
          when(shiftright(h, i).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(s > 0, lit(1L << i)).otherwise(lit(0L))
    }
    val sim = bits.reduce((a, b) => a.bitwiseOR(b))
    df.select(col(idCol).as("doc"), sim.as("simhash"))
  }

  /** Candidate near-dup pairs by SimHash chunk collision + Hamming
    * distance <= maxDist verification. */
  def simhashDupPairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame = {
    val sim = simhash64(df, idCol, textCol).cache()
    val chunked = sim.select(col("doc"), col("simhash"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("simhash"), i * 16).bitwiseAND(0xFFFFL)): _*)))
      .toDF("doc", "simhash", "chunk", "chunkval")
    val cand = chunked.as("a").join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") &&
          col("a.chunkval") === col("b.chunkval") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("a.simhash").as("sim_a"),
        col("b.doc").as("doc_b"), col("b.simhash").as("sim_b"))
      .distinct()
    cand.withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .where(col("hamming") <= maxDist)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }
}
