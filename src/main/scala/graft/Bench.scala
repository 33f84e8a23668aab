package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

object Bench {

  /** Execute the query's real declared shape: a `noop` sink runs the whole
    * plan including final global sorts, which a bare `count()` would let
    * Catalyst elide (the r1 bench under-measured sort cost that way). */
  private def exec(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    // Time the approximate operators ALONE: the declared queries' recall
    // instrumentation embeds exact references that are benchmarked
    // standalone anyway (doc_jaccard_pairs, emb_cosine_topk,
    // emb_top_pairs_slice), and rel_sketches' exact countDistinct/percentile
    // twins are Verify-time error-bound evidence, not bench workload —
    // Verify keeps recall on for the correctness gate.
    sys.props("graft.recall") = "off"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Best-of-N timing (default 3), reps INTERLEAVED round-robin: rep 1 of
    // every query completes before rep 2 of any query starts. This host
    // shows multi-minute noisy-neighbor stall windows; back-to-back reps of
    // the same query both land inside one window, so min-over-reps didn't
    // escape it (r2's record overstated the slow queries up to 20×).
    // Interleaving spaces a query's reps minutes apart, so the min spans
    // different noise windows. Rep 1 doubles as the codegen+JIT warmup at
    // the TARGET sf (AQE picks different physical plans per data size).
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt)
    val names = SparkEntry.queries.keys.toSeq
    val best = scala.collection.mutable.LinkedHashMap[String, Double]()
    for (rep <- 1 to reps; name <- names) {
      val t0 = System.nanoTime()
      // A failed rep records NO time: a query whose analysis throws in
      // 0.06 s must not enter the record as a 0.06 s "measurement" (r8
      // post-mortem — six crashed queries "improved" 10-100× and the
      // guard baseline inherited the bogus limits). Queries with no
      // successful rep get the -1 sentinel below, which QueryProbe
      // --guard treats as an immediate red.
      val ok =
        try { exec(SparkEntry.queries(name)(spark, sfDir)); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name#$rep FAILED: " +
            s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}")
          false
        }
      val t = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      if (ok) best(name) = math.min(best.getOrElse(name, Double.MaxValue), t)
    }
    val failed = names.filterNot(best.contains)
    failed.foreach { n => best(n) = -1.0 }
    if (failed.nonEmpty)
      System.err.println(s"[bench] ${failed.size} queries FAILED every rep " +
        s"(sentinel -1 recorded): ${failed.mkString(", ")}")
    val results = best
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // total spans successful queries only — sentinel -1s must not shrink it
    val total = results.values.filter(_ >= 0).sum
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // first-build walls of the per-JVM artifact caches (rank table, e2e
    // pipeline, trained models, cluster frame): the queries that consume
    // them time a checkpoint READ after rep 1, so without this map a
    // training-cost regression hides behind the cache (r12 verdict task
    // 6). Keys are trimmed to the artifact name (one sf dir per run).
    val walls = SparkEntry.buildWalls.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k.takeWhile(_ != ':') + "\":" +
        math.rint(v * 1000) / 1000 }
      .mkString("{", ",", "}")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"build_walls":$walls,"sf":"$sfDir"}"""
    // Durable copy for the driver regardless of how stdout gets mangled.
    val outPath = sys.env.getOrElse("BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes("UTF-8")) catch { case _: Throwable => () }
    spark.stop()
    // Print LAST, after spark.stop(): no executor/log4j line can interleave
    // with the result line (build.sbt routes forked stdout through raw).
    System.out.flush()
    println(json)
    System.out.flush()
  }
}
