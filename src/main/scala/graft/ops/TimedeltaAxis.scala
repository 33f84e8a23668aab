package graft.ops

import graft.core.Observations.{KeyCol, TsCol, ValueCol}
import graft.model.{IndexMeta, Parameters, ProcessingType}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TimedeltaIndex compute path. The reference's resample accepts
  * TimedeltaIndex alongside DatetimeIndex
  * (/root/reference/src/meteaudata/processing_steps/univariate/
  * resample.py:43-46), and SignalIO.loadReferenceZip lands timedelta
  * archives on the engine's timestamp axis as epoch offsets. These
  * helpers make timedelta semantics explicit and EXACT: a timedelta is
  * integer microseconds, so the operators route onto the long axis
  * ([[IntAxis]]) — pure integer bucket arithmetic, no calendar/timezone
  * machinery, and SUB-SECOND frequencies ("250ms", "500us") are
  * first-class, which the timestamp-window path cannot express. Same
  * shuffle/window shapes as IntAxis, so the scale story carries over. */
object TimedeltaAxis {

  /** Epoch-offset timestamp axis (the loadReferenceZip convention for
    * timedelta archives) → long-µs axis. */
  def toMicros(series: DataFrame): DataFrame =
    series.select(col(KeyCol),
      unix_micros(col(TsCol)).as(IntAxis.IdxCol), col(ValueCol))

  /** Long-µs axis back to the engine's epoch-offset timestamp axis. */
  def toTimestamps(series: DataFrame): DataFrame =
    series.select(col(KeyCol),
      timestamp_micros(col(IntAxis.IdxCol)).as(TsCol), col(ValueCol))

  /** Tumbling timedelta resample by the deterministic mean: bucket
    * arithmetic in exact integer µs via [[IntAxis.resampleFixed]]. */
  def resample(series: DataFrame, freq: String, grid: Boolean): DataFrame =
    toTimestamps(IntAxis.resampleFixed(toMicros(series), Freq.micros(freq), grid))

  /** Linear gap interpolation on the timedelta axis (exact µs ratios). */
  def interpolate(series: DataFrame): DataFrame =
    toTimestamps(IntAxis.interpolate(toMicros(series)))
}

/** Engine-executor registration of the timedelta resample, so a loaded
  * timedelta signal processes without manual conversion:
  * `sig.process(Seq("TD#1_RAW#1"), ResampleTimedelta,
  * Parameters.of("frequency" -> "250ms"))`. */
object ResampleTimedelta extends SeriesTransform {
  val opName = "resample_timedelta"
  val suffix = "RESAMPLED"
  val ptype = ProcessingType.Resampling
  val description =
    "Resample a timedelta-indexed series by tumbling-window mean (exact µs buckets)"

  def transform(series: DataFrame, params: Parameters): DataFrame = {
    val freq = params.get("frequency").getOrElse(
      throw new IllegalArgumentException("resample_timedelta requires 'frequency'"))
    val grid = params.get("grid").forall(_.toBoolean)
    TimedeltaAxis.resample(series, freq, grid)
  }

  override def updatedIndex(index: IndexMeta, params: Parameters): IndexMeta = {
    val grid = params.get("grid").forall(_.toBoolean)
    index.copy(frequency = if (grid) params.get("frequency") else None)
  }
}
