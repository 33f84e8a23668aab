package graft.model

/** Metadata model mirroring the reference's pydantic types
  * (/root/reference/src/meteaudata/types.py) re-expressed as immutable Scala
  * case classes. Data stays in distributed DataFrames; this catalog is
  * driver-side and small — O(number of series), never O(rows).
  */

/** Closed set of 13 processing-step categories.
  * Ref: types.py:183-196 (`ProcessingType` enum). */
sealed abstract class ProcessingType(val value: String)
object ProcessingType {
  case object Sorting extends ProcessingType("sorting")
  case object RemoveDuplicates extends ProcessingType("remove_duplicates")
  case object Smoothing extends ProcessingType("smoothing")
  case object Filtering extends ProcessingType("filtering")
  case object Resampling extends ProcessingType("resampling")
  case object GapFilling extends ProcessingType("gap_filling")
  case object Prediction extends ProcessingType("prediction")
  case object Transformation extends ProcessingType("transformation")
  case object DimensionalityReduction extends ProcessingType("dimensionality_reduction")
  case object FaultDetection extends ProcessingType("fault_detection")
  case object FaultIdentification extends ProcessingType("fault_identification")
  case object FaultDiagnosis extends ProcessingType("fault_diagnosis")
  case object Other extends ProcessingType("other")

  val all: Seq[ProcessingType] = Seq(Sorting, RemoveDuplicates, Smoothing,
    Filtering, Resampling, GapFilling, Prediction, Transformation,
    DimensionalityReduction, FaultDetection, FaultIdentification,
    FaultDiagnosis, Other)

  def fromString(s: String): ProcessingType =
    all.find(_.value == s).getOrElse(
      throw new IllegalArgumentException(s"unknown ProcessingType: $s"))
}

/** Open-schema parameter bag. Ref: types.py:176-180 (`Parameters`,
  * pydantic extra="allow"). Values are stored as strings (JSON-encoded when
  * structured) — the Spark-faithful equivalent of an open struct. */
final case class Parameters(entries: Map[String, String]) {
  def get(key: String): Option[String] = entries.get(key)
}
object Parameters {
  val empty: Parameters = Parameters(Map.empty)
  def of(kvs: (String, String)*): Parameters = Parameters(kvs.toMap)
}

/** Where the raw data came from. Ref: types.py:199-206 (`DataProvenance`). */
final case class DataProvenance(
    sourceRepository: Option[String] = None,
    project: Option[String] = None,
    location: Option[String] = None,
    equipment: Option[String] = None,
    parameter: Option[String] = None,
    purpose: Option[String] = None,
    metadataId: Option[String] = None)

/** Identity of the transform function that produced a step.
  * Ref: types.py:209-239 (`FunctionInfo`). The reference captures the
  * function's full Python source via stack inspection (types.py:221-239);
  * on the JVM there is no equivalent, so operators register a canonical
  * `sourceDescription` at definition time instead (SURVEY.md §7.4 item 6). */
final case class FunctionInfo(
    name: String,
    version: String,
    author: String,
    reference: String,
    sourceDescription: Option[String] = None)

/** The lineage atom. Ref: types.py:242-254 (`ProcessingStep`).
  * `stepDistance` is the forward/backward shift a prediction introduces
  * (CHANGELOG.md:9); `inputSeriesNames` makes lineage a DAG
  * (CHANGELOG.md:18). `runDatetime` is epoch millis (deterministic
  * injection in tests). */
final case class ProcessingStep(
    stepType: ProcessingType,
    description: String,
    runDatetime: Long,
    requiresCalibration: Boolean,
    functionInfo: FunctionInfo,
    parameters: Parameters,
    suffix: String,
    stepDistance: Int = 0,
    inputSeriesNames: Seq[String] = Nil)

object ProcessingStep {
  /** Order-preserving de-duplication of equal steps, applied after every
    * process call. Ref: types.py:466-473 (`remove_duplicated_steps`). */
  def dedup(steps: Seq[ProcessingStep]): Seq[ProcessingStep] =
    steps.distinct
}

/** Index (time axis) schema carried in the catalog so a lossy sink (CSV)
  * can be restored with full index type/tz/frequency fidelity.
  * Ref: types.py:82-173 (`IndexMetadata`,
  * `extract_index_metadata`/`reconstruct_index`). */
final case class IndexMeta(
    kind: IndexKind,
    name: Option[String] = None,
    dtype: String = "timestamp",
    frequency: Option[String] = None,
    timeZone: Option[String] = None,
    closed: Option[String] = None,
    categories: Seq[String] = Nil,
    ordered: Option[Boolean] = None,
    start: Option[Long] = None,
    end: Option[Long] = None,
    step: Option[Long] = None)

/** The index kinds the reference round-trips (types.py:106-170;
  * tests/test_index_metadata.py:94-211). */
sealed abstract class IndexKind(val value: String)
object IndexKind {
  case object DatetimeIndex extends IndexKind("datetime")
  case object TimedeltaIndex extends IndexKind("timedelta")
  case object PeriodIndex extends IndexKind("period")
  case object IntervalIndex extends IndexKind("interval")
  case object CategoricalIndex extends IndexKind("categorical")
  case object RangeIndex extends IndexKind("range")
  case object PlainIndex extends IndexKind("plain")
  val all: Seq[IndexKind] = Seq(DatetimeIndex, TimedeltaIndex, PeriodIndex,
    IntervalIndex, CategoricalIndex, RangeIndex, PlainIndex)
  def fromString(s: String): IndexKind =
    all.find(_.value == s).getOrElse(
      throw new IllegalArgumentException(s"unknown IndexKind: $s"))
}

/** Catalog entry for one time series (one processing state of a signal).
  * Ref: types.py:261-476 (`TimeSeries`) minus the data payload, which lives
  * in the distributed observations DataFrame keyed by `seriesKey`. */
final case class SeriesMeta(
    seriesKey: String,
    steps: Seq[ProcessingStep] = Nil,
    index: IndexMeta = IndexMeta(IndexKind.DatetimeIndex),
    valuesDtype: String = "double",
    createdOn: Long = 0L)

/** Catalog entry for one signal (named physical quantity).
  * Ref: types.py:498-1177 (`Signal`). `series` preserves insertion order
  * (the reference uses an ordered dict). */
final case class SignalMeta(
    name: String,
    units: String,
    provenance: DataProvenance = DataProvenance(),
    createdOn: Long = 0L,
    lastUpdated: Long = 0L,
    series: Vector[SeriesMeta] = Vector.empty) {
  def seriesKeys: Seq[String] = series.map(_.seriesKey)
  def seriesMeta(key: String): Option[SeriesMeta] =
    series.find(_.seriesKey == key)
}

/** Catalog entry for a dataset. Ref: types.py:1203-1500 (`Dataset`). */
final case class DatasetMeta(
    name: String,
    description: String = "",
    owner: String = "",
    purpose: String = "",
    project: String = "",
    createdOn: Long = 0L,
    lastUpdated: Long = 0L,
    signals: Vector[SignalMeta] = Vector.empty) {
  def signalNames: Seq[String] = signals.map(_.name)
  def signal(name: String): Option[SignalMeta] =
    signals.find(_.name == name)
}

/** One drawn shape of the dependency-graph layout — a node box or an
  * edge line, with the label midpoint. Ref: types.py:951-1054
  * (`plot_dependency_graph`): node i of n gets box [i, i+1] × [i/n,
  * (i+1)/n] drawn with 0.1 padding; an edge runs from the origin box's
  * right edge to the destination box's left edge at the boxes' y
  * middles, labeled at the midpoint of the two box middles. */
final case class LayoutShape(
    kind: String, // "node" | "edge"
    label: String, // series name | step name
    x0: Double, y0: Double, x1: Double, y1: Double,
    xm: Double, ym: Double)

/** One edge of the retrospective dependency graph.
  * Ref: types.py:928-949 (`build_dependency_graph`). */
final case class DependencyEdge(
    step: String,
    stepType: String,
    origin: String,
    destination: String)
