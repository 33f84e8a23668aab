package graft.ops

import graft.core.Observations.{KeyCol, ValueCol}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Integer-axis (RangeIndex) twins of the time-indexed operators.
  *
  * The reference round-trips RangeIndex series with data
  * (/root/reference/src/meteaudata/types.py:106-170;
  * tests/test_index_metadata.py:94-211) — sample-counter axes, depth
  * profiles, cycle numbers. The canonical frame here is
  * (series_key, idx: long, value); the operators are the same shapes as
  * [[Resample]]/[[Interpolate]] with the bucket arithmetic on the long
  * axis instead of timestamps — identical shuffle/window structure, so
  * everything said about their scale behaviour carries over.
  */
object IntAxis {
  val IdxCol = "idx"

  /** Tumbling integer-bucket resample by the deterministic mean
    * ([[Resample.detMean]]); bucket = floor(idx/step)·step (pmod keeps the
    * floor semantics on negative axes). `grid = true` emits every bucket
    * between each series' min and max (empty buckets null), like the
    * pandas-parity timestamp grid. */
  def resampleFixed(series: DataFrame, step: Long, grid: Boolean): DataFrame = {
    val bucketed = series
      .groupBy(col(KeyCol),
        (col(IdxCol) - pmod(col(IdxCol), lit(step))).as(IdxCol))
      .agg(Resample.detMean(col(ValueCol)).as(ValueCol))
    if (!grid) bucketed.select(col(KeyCol), col(IdxCol), col(ValueCol))
    else {
      val spans = bucketed.groupBy(col(KeyCol))
        .agg(min(IdxCol).as("mn"), max(IdxCol).as("mx"))
      val gridDf = spans.select(col(KeyCol),
        explode(sequence(col("mn"), col("mx"), lit(step))).as(IdxCol))
      gridDf.join(bucketed, Seq(KeyCol, IdxCol), "left")
        .select(col(KeyCol), col(IdxCol), col(ValueCol))
    }
  }

  /** Linear interpolation of null gaps over the integer axis — the same
    * two-window-pass shape as [[Interpolate]] (leading nulls stay null,
    * trailing nulls forward-fill), with the interpolation ratio computed
    * on the axis cast to double (exact for |idx| < 2^53). */
  def interpolate(series: DataFrame): DataFrame = {
    val wPrev = Window.partitionBy(KeyCol).orderBy(IdxCol)
      .rowsBetween(Window.unboundedPreceding, 0)
    // reversed running frame instead of (0, unboundedFollowing) — see
    // the O(partition²) note in [[Interpolate.transform]]
    val wNextRev = Window.partitionBy(KeyCol).orderBy(col(IdxCol).desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val v = col(ValueCol)
    val axis = col(IdxCol).cast("double")
    val staged = series
      .withColumn("_pv", last(v, ignoreNulls = true).over(wPrev))
      .withColumn("_pt", last(when(v.isNotNull, axis), ignoreNulls = true).over(wPrev))
      .withColumn("_nv", last(v, ignoreNulls = true).over(wNextRev))
      .withColumn("_nt", last(when(v.isNotNull, axis), ignoreNulls = true).over(wNextRev))
    val (pv, pt, nv, nt) = (col("_pv"), col("_pt"), col("_nv"), col("_nt"))
    val interp =
      when(v.isNotNull, v)
        .when(pv.isNotNull && nv.isNotNull && (nt =!= pt),
          pv + (nv - pv) * (axis - pt) / (nt - pt))
        .when(pv.isNotNull, pv)
        .otherwise(lit(null).cast("double"))
    staged.select(col(KeyCol), col(IdxCol), interp.as(ValueCol))
  }
}
