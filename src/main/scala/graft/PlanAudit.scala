package graft

/** Ad-hoc physical-plan audit over declared queries: one summary line of
  * join/exchange/codegen structure per query, plus the full formatted
  * plan with `--full`. The cheap way to answer "did this query pick up
  * an accidental cartesian / lose its broadcast / fall out of
  * whole-stage codegen" without reading walls of explain output.
  *
  *   sbt "runMain graft.PlanAudit <sfDir> q1,q2,..."
  *   sbt "runMain graft.PlanAudit <sfDir> q1 --full"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val full = args.contains("--full")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      val df = SparkEntry.queries(n)(spark, sfDir)
      val p = df.queryExecution.executedPlan.toString
      def c(re: String) = re.r.findAllIn(p).length
      println(s"=== $n ===")
      println(s"  CartesianProduct=${c("CartesianProduct")}" +
        s" BroadcastNestedLoop=${c("BroadcastNestedLoop")}" +
        s" BroadcastHashJoin=${c("BroadcastHashJoin")}" +
        s" SortMergeJoin=${c("SortMergeJoin")}" +
        s" ShuffledHashJoin=${c("ShuffledHashJoin")}" +
        // negative lookbehind: "BroadcastExchange " must not inflate the
        // SHUFFLE-exchange count (r10 review)
        s" Exchange=${c("(?<!Broadcast)Exchange ")}" +
        // NOTE: under AQE the pre-execution plan carries no codegen
        // markers (isFinalPlan=false) — this counter only reads >0 when
        // AQE is off or the plan was executed; the join/exchange
        // structure checks are the reliable part of this audit
        s" WholeStageCodegen=${c("\\*\\(")}")
      if (full) println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
