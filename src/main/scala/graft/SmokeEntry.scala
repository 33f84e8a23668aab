package graft

import org.apache.spark.sql.SparkSession

/** Local stand-in for the driver's t1 smoke: `SparkEntry.entry` in a
  * bare session (no graft-specific conf) must return rows on sf0.001. */
object SmokeEntry {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"[smoke] entry rows = ${SparkEntry.entry(spark).count()}")
    spark.stop()
  }
}
