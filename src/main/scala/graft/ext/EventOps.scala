package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics: sessionization, as-of lookup, JSON property
  * extraction, time-window rollups. All window specs partition by the
  * entity key, so one shuffle+sort per pipeline is reused across the
  * chained window expressions (Catalyst collapses same-spec windows).
  */
object EventOps {

  /** Epoch seconds as a fractional DOUBLE, NTZ-safe: TIMESTAMP_NTZ has no
    * direct numeric cast in Spark 4, so retag to session-tz TIMESTAMP
    * first (session tz pinned UTC → identical micros; a no-op cast on an
    * already-TZ column). Every piece of epoch arithmetic in the event
    * operators routes through here so an upstream dtype drift breaks one
    * function, not six queries. */
  def epochD(ts: Column): Column =
    ts.cast(org.apache.spark.sql.types.TimestampType).cast("double")

  /** Floor epoch seconds as BIGINT — the engine-portable timestamp
    * rendering (DuckDB: `CAST(floor(epoch(ts)) AS BIGINT)`). */
  def epochS(ts: Column): Column = floor(epochD(ts)).cast("long")

  /** Gap-based sessionization: a new session starts when the gap to the
    * previous event of the same key exceeds `gapSeconds`. session_id is the
    * running count of session starts (1-based). Deterministic tie-break:
    * events ordered by (ts, idCol). */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val prevTs = lag(col(tsCol), 1).over(w)
    val isStart = when(prevTs.isNull ||
      (epochD(col(tsCol)) - epochD(prevTs)) > gapSeconds, 1L)
      .otherwise(0L)
    df.withColumn("session_id",
      sum(isStart).over(w.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Per-session rollup: bounds + event count. */
  def sessionStats(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      gapSeconds: Long): DataFrame =
    sessionize(df, keyCol, tsCol, idCol, gapSeconds)
      .groupBy(col(keyCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(epochS(col(tsCol))).as("start_s"),
        max(epochS(col(tsCol))).as("end_s"))
      .withColumn("duration_s", col("end_s") - col("start_s"))

  /** As-of lookup within one stream: for every row, the timestamp of the
    * key's most recent row (strictly before, by (ts, id) order) satisfying
    * `marker`. The classic sensor-fusion as-of join expressed as
    * `last(..., ignoreNulls)` over one sorted pass — no join, no skew. */
  def asOfMarker(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      marker: Column, outCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn(outCol,
      last(when(marker, col(tsCol)), ignoreNulls = true).over(w))
  }

  /** General as-of join of two event frames on a shared key: each left row
    * gets the latest right row with rightTs <= leftTs. Implemented
    * union-style (tag + single sorted window pass) so it scales like a
    * sort-merge join without materializing the pairwise product. `payload`
    * columns from the right side are carried through. `rightIdCol` (a
    * unique right-side column) breaks ties among right rows sharing
    * (key, ts) so the joined payload is deterministic under any
    * partitioning — the highest id wins. */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, payloadCols: Seq[String],
      rightIdCol: Option[String] = None): DataFrame = {
    val lTag = left.withColumn("_side", lit(1))
      .withColumns(payloadCols.map(c => c -> lit(null).cast(right.schema(c).dataType)).toMap)
      .withColumn("_rid", lit(null).cast("long"))
    val rTag = right.select((Seq(keyCol, tsCol).map(col) :+ lit(0).as("_side")) ++
      payloadCols.map(col) :+
      rightIdCol.map(c => col(c).cast("long")).getOrElse(lit(0L)).as("_rid"): _*)
    val all = lTag.select(lTag.columns.toIndexedSeq.map(col): _*)
      .unionByName(rTag, allowMissingColumns = true)
    // left rows (side 1) sort after all right rows at the same ts; right
    // rows at the same ts order by _rid, so "last" is the max-id row
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("_side"), col("_rid"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = payloadCols.foldLeft(all) { (d, c) =>
      d.withColumn(c, last(when(col("_side") === 0, col(c)), ignoreNulls = true).over(w))
    }
    filled.where(col("_side") === 1).drop("_side", "_rid")
  }

  /** Bucketed range join: match events to [start, end] intervals without a
    * nested-loop θ-join. Intervals explode to the fixed-width buckets they
    * cover, events key into their single bucket, and a plain equi-join on
    * the bucket plus an exact containment filter does the rest — shuffle
    * and parallelism behave like any hash join (work ∝ events +
    * Σ interval spans / bucket width), which is the interval-join shape
    * that survives a 100 TB scale-up. Each (event, interval) match
    * surfaces exactly once (the event's bucket is unique). */
  def bucketedRangeJoin(events: DataFrame, intervals: DataFrame,
      tsCol: String, startCol: String, endCol: String,
      bucketSec: Long): DataFrame = {
    val evB = events.withColumn("_bkt",
      floor(epochD(col(tsCol)) / bucketSec).cast("long"))
    val ivB = intervals.withColumn("_bkt", explode(sequence(
      floor(epochD(col(startCol)) / bucketSec).cast("long"),
      floor(epochD(col(endCol)) / bucketSec).cast("long"))))
    evB.join(ivB, Seq("_bkt"))
      .where(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("_bkt")
  }

  /** Typed JSON property extraction from a string column (the multimodal
    * `props` sidecar): `get_json_object` stays native/codegen'd. */
  def jsonLong(c: Column, path: String): Column =
    get_json_object(c, path).cast("long")

  /** Tumbling-window rollup per event_type (count/sum/min/max over the
    * extracted JSON metric). */
  def windowRollup(df: DataFrame, tsCol: String, typeCol: String,
      metric: Column, windowSec: Long): DataFrame =
    df.groupBy(col(typeCol),
        window(col(tsCol), s"$windowSec seconds").getField("start").as("bucket"))
      .agg(count(lit(1)).as("n"), sum(metric).as("sum_m"),
        min(metric).as("min_m"), max(metric).as("max_m"))

  /** Top event-type transitions: consecutive-event pairs INSIDE a
    * session (same gap rule as [[sessionStats]]), counted corpus-wide —
    * the Markov-chain edge mining behind navigation and funnel analysis.
    * One key-shuffle drives both the sessionization windows and the
    * `lead` (identical partition spec, one sort), then the pair counts
    * collapse to at most |types|² rows via a map-side-combinable
    * aggregate; the top-k cut is a TakeOrdered over that tiny frame. */
  def transitionTopK(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, gapSeconds: Long, typeCol: String, k: Int): DataFrame = {
    val sess = sessionize(df, keyCol, tsCol, idCol, gapSeconds)
    val w = Window.partitionBy(col(keyCol), col("session_id"))
      .orderBy(col(tsCol), col(idCol))
    sess.withColumn("_next", lead(col(typeCol), 1).over(w))
      .where(col("_next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("_next").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("from_type"), col("to_type"))
      .limit(k)
  }

  /** Ordered k-step funnel: per key, each step is reached at the
    * earliest event time that respects step ORDER (t₁ = min time of
    * step 1; tᵢ = min time of step i strictly after tᵢ₋₁) and the
    * overall window (tᵢ ≤ t₁ + windowSec); emits per-step reached-key
    * counts with conversion vs step 1. The classic product-analytics
    * ordered funnel (not just pairwise conversion like the 2-step
    * `event_funnel`).
    *
    * Scale shape: join-free over the raw stream per step — step i is
    * one filtered co-keyed aggregate joined to the O(keys) frontier
    * frame from step i-1 (frontiers shrink monotonically), so k steps
    * cost k key-hash aggregates + k frontier joins and NO window or
    * sort over raw events. All times are floor-epoch BIGINTs — integer
    * mins, engine-exact. */
  def funnelSteps(df: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, steps: Seq[String], windowSec: Long): DataFrame = {
    require(steps.nonEmpty)
    val es = df.select(col(keyCol).as("u"), col(typeCol).as("et"),
      epochS(col(tsCol)).as("ts_s"))
    val first = es.where(col("et") === steps.head)
      .groupBy(col("u")).agg(min(col("ts_s")).as("t1"))
      .withColumn("tp", col("t1"))
    val frontiers = steps.tail.scanLeft(first) { (prev, step) =>
      es.where(col("et") === step)
        .join(prev.select(col("u"), col("t1"), col("tp")), "u")
        .where(col("ts_s") > col("tp") &&
          col("ts_s") <= col("t1") + windowSec)
        .groupBy(col("u"), col("t1")).agg(min(col("ts_s")).as("tp"))
        .select(col("u"), col("t1"), col("tp"))
    }
    val counts = frontiers.zip(steps).zipWithIndex.map {
      case ((f, step), i) =>
        f.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1).as("step_idx"), lit(step).as("step"),
            col("n_users"))
    }
    val all = counts.reduce(_.unionByName(_))
    val w = Window.partitionBy(lit(1))
    all.withColumn("rate", round(col("n_users").cast("double") /
        max(when(col("step_idx") === 1, col("n_users"))).over(w), 6))
      .select(col("step_idx"), col("step"), col("n_users"), col("rate"))
  }

  /** Daily/weekly active users: per epoch day, the distinct-key count
    * that day (DAU) and over the trailing 7-day window (WAU) — the
    * engagement pair every event pipeline reports. Scale shape: ONE
    * distinct on (key, day) collapses the raw stream; DAU is a count
    * over that frame; WAU joins the tiny distinct-day list (broadcast —
    * it is O(days), not O(events)) back to (key, day) with a ≤7-day
    * range predicate, so each collapsed row fans out at most 7× before
    * the distinct-count aggregate. No window over the raw stream, no
    * sliding state. */
  def activeUsers(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val day = floor(epochS(col(tsCol)).cast("double") / 86400.0).cast("long")
    val ud = df.select(col(keyCol).as("u"), day.as("d")).distinct()
    val days = ud.select(col("d").as("day")).distinct()
    val dau = ud.groupBy(col("d").as("day"))
      .agg(count(lit(1)).as("dau"))
    val wau = broadcast(days).join(ud,
        col("d").between(col("day") - 6, col("day")))
      .groupBy(col("day"))
      .agg(countDistinct(col("u")).as("wau"))
    dau.join(wau, "day")
  }

  /** Weekly cohort retention: cohort = the key's first-activity epoch
    * week (floor(epoch_s / 604800) — an absolute engine-portable week
    * index, no calendar/week-start semantics to diverge on); for each
    * (cohort_week, week_offset), the count of cohort keys active that
    * week and the retained fraction of the cohort's week-0 size.
    *
    * Scale shape: one distinct on (key, week) collapses the raw stream
    * to at most keys×weeks rows, then the per-key min and the
    * activity↔cohort join both shuffle on the SAME key — Catalyst
    * reuses the exchange, so the whole pipeline is one key-hash
    * shuffle plus one tiny (cohort, offset) aggregate; the week-0
    * normalization window runs over that already-small rollup. All
    * counts are exact integers; the single division is rounded at 6 dp. */
  def weeklyRetention(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val week = floor(epochS(col(tsCol)).cast("double") / 604800.0).cast("long")
    val activity = df.select(col(keyCol).as("u"), week.as("week")).distinct()
    val cohort = activity.groupBy(col("u"))
      .agg(min(col("week")).as("cohort_week"))
    val rollup = activity.join(cohort, "u")
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
    val w = Window.partitionBy(col("cohort_week"))
    rollup.withColumn("_size",
        max(when(col("week_offset") === 0L, col("n_users"))).over(w))
      .select(col("cohort_week"), col("week_offset"), col("n_users"),
        round(col("n_users").cast("double") / col("_size"), 6).as("retention"))
  }
}
