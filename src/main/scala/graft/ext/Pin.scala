package graft.ext

import org.apache.spark.sql.DataFrame

/** Lineage-severing eager materialization for iterative loops and
  * multi-consumer frames (PageRank rounds, k-means rounds, connected
  * components, the Ranks range-exchange pins).
  *
  * Default form: eager `localCheckpoint` — blocks live in executor
  * storage, no filesystem round-trip, the fastest pin and the right one
  * for local mode and healthy clusters. Its cluster-grade weakness: an
  * executor loss mid-job loses the only copy of that executor's blocks
  * and FAILS the query instead of recomputing (localCheckpoint severs
  * the lineage that recovery would replay).
  *
  * Opt-in reliable form: set session conf
  * `spark.graft.reliableCheckpoint=true` and provide a checkpoint
  * directory (either `SparkContext.setCheckpointDir` beforehand or the
  * conf `spark.graft.checkpoint.dir`, which this helper applies
  * lazily). Pins then route through eager `checkpoint()` — blocks land
  * on the checkpoint filesystem (HDFS / object store), so losing an
  * executor mid-iteration re-reads the checkpoint instead of killing
  * the query. The price is one filesystem write + read per pin, which
  * is why it is opt-in rather than the default.
  *
  * Both forms are EAGER and yield value-identical frames — only the
  * storage/recovery story differs (PinSpec toggles the flag and
  * asserts bit-identical results).
  *
  * Reliable-mode housekeeping: Spark does NOT reclaim `checkpoint(true)`
  * data by default (`spark.cleaner.referenceTracking.cleanCheckpoints`
  * defaults to false), so a long-running iterative job — PageRank,
  * connected components, k-means — leaks one full frame copy per pin on
  * the checkpoint filesystem for the application lifetime. Set
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` in the
  * SparkConf AT CONTEXT STARTUP when enabling reliable pins (the
  * ContextCleaner reads it once at SparkContext init — it cannot be
  * flipped later via `spark.conf.set`); checkpoints are then deleted
  * when their frames are garbage-collected. Jobs that cannot set it at
  * startup should delete the checkpoint dir between runs.
  */
object Pin {

  /** Conf key enabling the reliable-checkpoint form. */
  val ReliableKey = "spark.graft.reliableCheckpoint"

  /** Conf key naming the checkpoint directory to apply lazily when the
    * context has none set. */
  val DirKey = "spark.graft.checkpoint.dir"

  def pin(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    if (!s.conf.get(ReliableKey, "false").toBoolean) df.localCheckpoint(true)
    else {
      if (s.sparkContext.getCheckpointDir.isEmpty) {
        val d = s.conf.get(DirKey, "")
        require(d.nonEmpty, s"$ReliableKey=true requires a checkpoint dir: " +
          s"call SparkContext.setCheckpointDir or set $DirKey")
        s.sparkContext.setCheckpointDir(d)
      }
      df.checkpoint(true)
    }
  }
}
