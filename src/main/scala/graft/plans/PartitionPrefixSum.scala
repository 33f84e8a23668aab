package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType
import org.apache.spark.unsafe.types.UTF8String

/** Custom whole-operator plan: per-partition, per-stratum INCLUSIVE
  * running sum of a long column, computed in ONE forward pass over rows
  * already ordered (strata, ord) within their partition.
  *
  * Why a custom physical operator instead of a window: Spark's
  * WindowExec demands its child be hash-partitioned on the window
  * partition keys, so `sum(v) OVER (PARTITION BY _pid, strata ORDER BY
  * ord)` re-shuffles the ENTIRE corpus that [[graft.ext.Ranks
  * .stratifiedRunningSum]] just range-partitioned — a second full-width
  * exchange carrying zero information (every (_pid, strata) group is
  * already wholly inside partition _pid, already in order). No
  * composition of built-in operators expresses "scan each partition in
  * its stored order and accumulate per group" without that exchange,
  * which is exactly the case SURVEY §2's preference order reserves for
  * a custom LogicalPlan + Strategy + SparkPlan.
  *
  * Contract (enforced by the one caller, Ranks.stratifiedRunningSum):
  * the child is materialized (localCheckpoint) AFTER
  * `repartitionByRange(strata ++ ord).sortWithinPartitions(strata ++
  * ord)`, so rows arrive grouped by strata and ordered by ord inside
  * every partition, and the checkpoint pins that layout for every
  * consumer. The operator is partitioning- and order-PRESERVING
  * (outputPartitioning/Ordering delegate to the child) and appends one
  * LongType column. Null semantics match `sum() OVER`: null values
  * leave the accumulator unchanged, and the output is null until the
  * group's first non-null value (sum over an empty frame is null, not
  * 0).
  *
  * The appended [[AttributeReference]] is a constructor argument, not a
  * lazy val, so plan transforms that copy the node preserve its exprId
  * and references above it stay resolved.
  */
final case class PartitionPrefixSum(strataAttrs: Seq[Attribute],
    valueAttr: Attribute, outAttr: AttributeReference, child: LogicalPlan)
  extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ outAttr
  // outAttr is PRODUCED here, not consumed — without producedAttributes
  // the analyzer counts it among `references` and fails with
  // MISSING_ATTRIBUTES; conversely strata/value attrs MUST be real
  // expressions of this node (not names) so `references` keeps column
  // pruning from stripping them out of the child
  override def producedAttributes: AttributeSet = AttributeSet(outAttr)
  override protected def withNewChildInternal(
      newChild: LogicalPlan): PartitionPrefixSum = copy(child = newChild)
}

object PartitionPrefixSum {
  def strategy: SparkStrategy = PrefixSumStrategy

  def ensureRegistered(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(PrefixSumStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ PrefixSumStrategy
    }

  /** Append `out` = the per-(partition, strata-group) inclusive running
    * sum of LongType column `valueCol`, scanning each partition in its
    * stored order (the caller guarantees rows are grouped by
    * `strataCols` and ordered within groups — see the class doc).
    * Registers the planning strategy on the session idempotently. */
  def runningSum(df: org.apache.spark.sql.DataFrame, strataCols: Seq[String],
      valueCol: String, out: String): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    ensureRegistered(spark)
    val analyzed = df.queryExecution.analyzed
    def attrOf(n: String): Attribute = analyzed.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(
        s"PartitionPrefixSum: no column '$n' in ${analyzed.output.map(_.name)}"))
    val node = PartitionPrefixSum(strataCols.map(attrOf), attrOf(valueCol),
      AttributeReference(out, LongType, nullable = true)(), analyzed)
    org.apache.spark.sql.graft.PlanBridge.ofRows(spark, node)
  }
}

object PrefixSumStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case PartitionPrefixSum(strata, value, outAttr, child) =>
      PartitionPrefixSumExec(strata, value, outAttr, planLater(child)) :: Nil
    case _ => Nil
  }
}

final case class PartitionPrefixSumExec(strataAttrs: Seq[Attribute],
    valueAttr: Attribute, outAttr: AttributeReference, child: SparkPlan)
  extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ outAttr
  override def producedAttributes: AttributeSet = AttributeSet(outAttr)
  override def outputPartitioning = child.outputPartitioning
  override def outputOrdering = child.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val strataIdx = strataAttrs.map { a =>
      val i = child.output.indexWhere(_.exprId == a.exprId)
      require(i >= 0,
        s"PartitionPrefixSum: no column '${a.name}' in child output")
      // group boundaries are detected by VALUE equality on the stored
      // representation — sound for atomic non-floating types (strings,
      // integrals, decimals, dates); floats would split NaN groups
      // (NaN != NaN) and arrays/structs compare by reference
      import org.apache.spark.sql.types._
      child.output(i).dataType match {
        case FloatType | DoubleType =>
          throw new IllegalArgumentException(
            s"PartitionPrefixSum: floating-point stratum '${a.name}' " +
              "unsupported (NaN breaks equality grouping)")
        case StringType | BooleanType | ByteType | ShortType |
             IntegerType | LongType | DateType | TimestampType |
             _: DecimalType => ()
        case dt => throw new IllegalArgumentException(
          s"PartitionPrefixSum: stratum '${a.name}' has type $dt — " +
            "value-equality grouping is only defined for atomic " +
            "non-floating types")
      }
      i
    }.toArray
    val strataTypes = strataIdx.map(child.output(_).dataType)
    val valIdx = child.output.indexWhere(_.exprId == valueAttr.exprId)
    require(valIdx >= 0,
      s"PartitionPrefixSum: no column '${valueAttr.name}' in child output")
    require(child.output(valIdx).dataType == LongType,
      s"PartitionPrefixSum: '${valueAttr.name}' must be LongType")
    val attrs = output
    child.execute().mapPartitions({ it =>
      val proj = UnsafeProjection.create(attrs, attrs)
      val joined = new JoinedRow
      val accRow = new GenericInternalRow(1)
      var prev: Array[Any] = null
      var acc = 0L
      var accNull = true
      // UTF8String/array values in unsafe rows point into reused
      // buffers — copy what we keep across rows
      def keyOf(row: InternalRow): Array[Any] = {
        val a = new Array[Any](strataIdx.length)
        var i = 0
        while (i < strataIdx.length) {
          a(i) = row.get(strataIdx(i), strataTypes(i)) match {
            case u: UTF8String => u.copy()
            case other => other
          }
          i += 1
        }
        a
      }
      def sameKey(row: InternalRow): Boolean = {
        if (prev == null) return false
        var i = 0
        while (i < strataIdx.length) {
          val v = row.get(strataIdx(i), strataTypes(i))
          if (v == null) { if (prev(i) != null) return false }
          else if (prev(i) == null || v != prev(i)) return false
          i += 1
        }
        true
      }
      it.map { row =>
        if (!sameKey(row)) { acc = 0L; accNull = true; prev = keyOf(row) }
        if (!row.isNullAt(valIdx)) {
          acc += row.getLong(valIdx)
          accNull = false
        }
        if (accNull) accRow.setNullAt(0) else accRow.setLong(0, acc)
        proj(joined(row, accRow))
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(
      newChild: SparkPlan): PartitionPrefixSumExec = copy(child = newChild)
}
