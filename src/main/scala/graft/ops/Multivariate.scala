package graft.ops

import graft.core.Observations._
import graft.model._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** A multivariate (cross-signal) transform — the Spark rendering of the
  * reference's `DatasetTransformFunctionProtocol`
  * (/root/reference/src/meteaudata/types.py:1180-1200). Receives the rows
  * of ALL input series in one tall frame and produces the rows of a new
  * signal's RAW series.
  *
  * The reference aligns series with `pd.concat(axis=1)` — an N-way outer
  * join on the index — then reduces row-wise (average.py:61-62). The
  * 100 TB-friendly equivalent is a single hash aggregation on `ts`
  * (map-side partials, one shuffle, no join explosion): outer-align +
  * row-wise-mean-ignoring-missing ≡ `AVG(value) GROUP BY ts`
  * (SURVEY.md §2.1 T5).
  */
trait DatasetTransform {
  def opName: String
  def suffix: String
  def ptype: ProcessingType
  def description: String
  def info: FunctionInfo =
    FunctionInfo(opName, "0.1.0", "graft", "graft.ops",
      Some(s"graft.ops.$opName: $description"))
  /** All input series' rows in; the new signal's RAW rows out (the caller
    * assigns the final series_key). */
  def transform(inputs: DataFrame, params: Parameters): DataFrame
  /** Base name for the created signal (e.g. "AVERAGE"); versioned by caller.
    * Ref: average.py:73-82 — result signal `AVERAGE#k` with one `RAW#1`. */
  def signalBaseName: String

  def step(params: Parameters, inputNames: Seq[String], runAt: Long): ProcessingStep =
    ProcessingStep(ptype, description, runAt, requiresCalibration = false,
      info, params, suffix, 0, inputNames)
}

/** Row-wise arithmetic mean across N aligned series.
  * Ref: multivariate/average.py:15-82. Unit agreement across inputs is
  * enforced by the catalog layer (average.py:42-46 raises ValueError).
  * Deterministic mean (exact decimal sum + one division) so results are
  * bit-stable across partitionings and engines. */
object AverageSignals extends DatasetTransform {
  val opName = "average_signals"
  val suffix = "RAW"
  val ptype = ProcessingType.DimensionalityReduction
  val description = "Row-wise mean across input series aligned on timestamp"
  val signalBaseName = "AVERAGE"

  def transform(inputs: DataFrame, params: Parameters): DataFrame =
    inputs.groupBy(col(TsCol))
      .agg(Resample.detMean(col(ValueCol)).as(ValueCol))
      .select(lit(signalBaseName).as(KeyCol), col(TsCol), col(ValueCol))
}

/** Row-wise sum across N aligned series — the reference's documented
  * dataset-transform pattern (`my_dataset_func`,
  * snippets/all_together_dataset.py:15-67; README.md:305-358). */
object SumSignals extends DatasetTransform {
  val opName = "sum_signals"
  val suffix = "RAW"
  val ptype = ProcessingType.Transformation
  val description = "Row-wise sum across input series aligned on timestamp"
  val signalBaseName = "SUM"

  def transform(inputs: DataFrame, params: Parameters): DataFrame =
    inputs.groupBy(col(TsCol))
      .agg(sum(col(ValueCol).cast(DecimalType(27, 8))).cast("double").as(ValueCol))
      .select(lit(signalBaseName).as(KeyCol), col(TsCol), col(ValueCol))
}
