package graft.ext

import graft.core.Observations._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-series statistics with the engine's deterministic-numerics
  * discipline: all accumulations are exact decimal sums (order- and
  * partitioning-independent); floating point appears only in a fixed
  * sequence of scalar ops at the end, so distributed results are
  * bit-stable and oracle-portable — the same property that lets every
  * aggregate in this engine hash-match a single-threaded reference.
  */
object CrossStats {

  /** Pearson correlation between two aligned series (inner join on ts).
    * Inputs should be pre-rounded to <= 6 decimals. Accumulators are
    * DECIMAL(38,6): the scale-6 cast of each term is deterministic (same
    * IEEE double in, same decimal out in any engine) and the scaled sums
    * stay < 2^53, so the decimal→double casts are exact — no
    * last-ulp divergence between engines even at large n.
    * corr = (n·Σxy − Σx·Σy) / (sqrt(n·Σx² − (Σx)²) · sqrt(n·Σy² − (Σy)²)),
    * evaluated in exactly that shape. Returns one row: (n, corr). */
  def correlation(obs: DataFrame, keyA: String, keyB: String): DataFrame = {
    val a = obs.where(col(KeyCol) === keyA)
      .select(col(TsCol), col(ValueCol).as("x"))
    val b = obs.where(col(KeyCol) === keyB)
      .select(col(TsCol), col(ValueCol).as("y"))
    val joined = a.join(b, Seq(TsCol))
    val dec: Column => Column = c => c.cast(DecimalType(38, 6))
    val agg = joined.agg(
      count(lit(1)).as("n"),
      sum(dec(col("x"))).cast("double").as("sx"),
      sum(dec(col("y"))).cast("double").as("sy"),
      sum(dec(col("x") * col("y"))).cast("double").as("sxy"),
      sum(dec(col("x") * col("x"))).cast("double").as("sxx"),
      sum(dec(col("y") * col("y"))).cast("double").as("syy"))
    agg.select(col("n"),
      ((col("n") * col("sxy") - col("sx") * col("sy")) /
        (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
          sqrt(col("n") * col("syy") - col("sy") * col("sy")))).as("corr"))
  }
}
