package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable frequency sketches (count-min) for corpus-scale frequency
  * estimation: the fixed-size, MERGEABLE summary a 100 TB pipeline uses
  * for hot-key / heavy-hitter detection where an exact global aggregate
  * per key is not worth its shuffle (per-shard summaries OR together
  * cell-wise; the exact twin `TextAnalysis.tokenStats` stays the
  * reference for when exactness is required — `rel_sketches` covers the
  * HLL/approx-percentile members of the family).
  *
  * Hashes are md5-derived (same portability construction as
  * [[Dedup.bloomBitPositions]] and `portableSimhash64`), so any SQL
  * engine rebuilds the IDENTICAL sketch and every estimate — including
  * each collision's overestimate — is deterministic and
  * exact-oracle-checkable.
  */
object Sketches {

  /** CMS bucket of `key` in row `row` of a width-`w` sketch: the 60-bit
    * md5 prefix of "cms<row>:<key>" mod w — non-negative, exact in a
    * long, identical in any engine with md5. */
  def cmsBucket(key: Column, row: Int, w: Int): Column =
    conv(substring(md5(concat(lit("cms" + row + ":"), key)), 1, 15), 16, 10)
      .cast("long") % w

  /** Build a d×w count-min sketch over a weighted key frame: cell
    * (row, h_row(key)) accumulates Σ cnt. At most d·w cells regardless
    * of input size — map-side combinable (a plain sum aggregate on a
    * short key), broadcastable, and MERGEABLE: the sketch of a union is
    * the cell-wise sum of the parts' sketches (pinned in ExtSpec), so
    * per-shard sketches combine without touching rows again. */
  def cmsBuild(df: DataFrame, keyCol: String, cntCol: String,
      d: Int, w: Int): DataFrame =
    df.select(explode(array((0 until d).map(j =>
        struct(lit(j).as("row"), cmsBucket(col(keyCol), j, w).as("cell"),
          col(cntCol).cast("long").as("cnt"))): _*)).as("e"))
      .groupBy(col("e.row").as("row"), col("e.cell").as("cell"))
      .agg(sum(col("e.cnt")).as("cnt"))

  /** Point-estimate keys against a built sketch: est(key) = min over the
    * d rows of that key's cell counts (0 for an unseen cell). Never an
    * underestimate; overestimates only on collisions, with
    * P[est > true + 2N/w] < (1/2)^d for N total weight. The probe is an
    * explode-to-d + broadcast join + min aggregate — the sketch side is
    * ≤ d·w rows by construction. */
  def cmsEstimate(keys: DataFrame, keyCol: String, sketch: DataFrame,
      d: Int, w: Int): DataFrame = {
    val pos = keys.select(col(keyCol), explode(array((0 until d).map(j =>
        struct(lit(j).as("row"), cmsBucket(col(keyCol), j, w).as("cell"))): _*))
        .as("e"))
      .select(col(keyCol), col("e.row").as("row"), col("e.cell").as("cell"))
    pos.join(broadcast(sketch), Seq("row", "cell"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
