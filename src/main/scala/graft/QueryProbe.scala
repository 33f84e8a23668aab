package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Sort => LSort}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Ad-hoc per-query timing probe: `runMain graft.QueryProbe <sfDir> <name>
  * [reps]` times one declared query repeatedly (noop sink) and once with
  * any final global Sort stripped, to expose range-partitioning
  * sample-pass re-execution. */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)
    def time(tag: String)(thunk: => Unit): Unit = {
      val t0 = System.nanoTime()
      thunk
      println(f"[probe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    (1 to reps).foreach { i =>
      time(s"$name#$i") {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
    }
    val df = fn(spark, sfDir)
    val stripped = df.queryExecution.logical transform {
      case LSort(_, true, child, _) => child
    }
    (1 to reps).foreach { i =>
      time(s"$name-nosort#$i") {
        ColumnBridge.ofRows(spark, stripped)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
