package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ordering primitives.
  *
  * A naive global `row_number() OVER (ORDER BY …)` collapses the whole
  * relation into ONE task — the classic scale-killer for ranking,
  * percentile and equi-depth-histogram queries. The shape that survives
  * 100 TB is range-partition → local sort → local row_number → add
  * per-partition offsets (a ~nParts-row cumulative sum, broadcast back).
  * Total cost: one range shuffle + one tiny side aggregate, with full
  * nParts-way parallelism on the big side.
  */
object Ranks {

  /** Global 1-based row numbers under the total order `ord` (callers must
    * include a unique tiebreak column so the order — and therefore the
    * numbering — is deterministic under any partitioning).
    *
    * The per-partition offset frame is O(nParts) rows: its single-
    * partition cumulative-sum window is driver-trivial by construction,
    * and it joins back broadcast. `spark_partition_id` is ordered by the
    * range partitioner (partition i holds keys below partition i+1), so
    * offset(p) = Σ counts of partitions < p is exactly the global rank
    * base. */
  def globalRowNumber(df: DataFrame, ord: Seq[Column], nParts: Int = 32,
      out: String = "rn"): DataFrame = {
    val sorted = df.repartitionByRange(nParts, ord: _*)
      .withColumn("_pid", spark_partition_id())
    val local = sorted.withColumn("_lrn",
      row_number().over(Window.partitionBy(col("_pid")).orderBy(ord: _*))
        .cast("long"))
    val offsets = local.groupBy(col("_pid"))
      .agg(count(lit(1)).as("_cnt"))
      .withColumn("_off", coalesce(
        sum(col("_cnt")).over(Window.orderBy(col("_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_pid"), col("_off"))
    local.join(broadcast(offsets), Seq("_pid"))
      .withColumn(out, col("_off") + col("_lrn"))
      .drop("_pid", "_lrn", "_off")
  }
}
