package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Clustered-table maintenance over two 8-bit bucket dimensions
  * (b1, b2): the write → localized-append → incremental-OPTIMIZE →
  * VACUUM lifecycle a z-ordered 100 TB table runs, with a WRITE-TIME
  * per-file stats manifest as the reader's prune source (the
  * Delta/Iceberg discipline — stats captured in the commit, never
  * re-derived by scanning data).
  *
  * Shapes, under the 100 TB lens:
  *  - the manifest is table-format METADATA (≤ file count rows); every
  *    prune/selection decision here collects it driver-side like any
  *    log replay, and no maintenance operation reads data files beyond
  *    the set it rewrites;
  *  - [[incrementalOptimize]] picks its rewrite set from manifest boxes
  *    alone (files intersecting the appended bounding box) — you cannot
  *    scan 100 TB to decide what to compact, and you cannot rewrite it
  *    all on a schedule;
  *  - [[vacuum]] is a listing-vs-manifest diff.
  *
  * Used by the `doc_zorder_manifest_prune` / `doc_zorder_incr_optimize`
  * / `doc_zorder_vacuum` queries (oracle-replayed end to end) and by
  * the `zorderinc1m` multi-generation tier.
  *
  * Reference framing: the reference engine (a pandas/pydantic
  * time-series library, /root/reference/src/meteaudata) has no storage
  * layer; this module exists for the driver-mandated 100 TB extension
  * surface. */
object ZTable {

  /** Bit-interleaved 16-bit Morton key over the b1/b2 bucket columns —
    * a pure function of (b1, b2), so a compaction job re-derives it
    * row-locally from data files without touching the source table. */
  def zkeyExpr: Column = (0 until 8).map { i =>
    shiftright(col("b1"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)) +
      shiftright(col("b2"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))
  }.reduce(_ + _)

  /** Write `frame` (idCol, b1, b2 + a rank column) as real parquet
    * under `out`, one data file per logical file id: file_id = offset +
    * (rank−1) div rpf with rpf = ceil(n/nFiles) (or `rpfOverride` when
    * ≥ 1 — the incremental-OPTIMIZE path sizes new files by the
    * TABLE's global rows-per-file, not the batch's), rows sorted by
    * rank within each file (the maxRecordsPerFile run a writer would
    * produce).
    *
    * Returns the WRITE-TIME stats manifest (file_id, path, b1_min,
    * b1_max, b2_min, b2_max, n_rows): per-file min/max computed from
    * the frame being written — never re-read from data afterwards —
    * with `path` resolved from a directory LISTING of the just-written
    * file_id partitions (metadata-only; mode `append` adds only NEW
    * file_id dirs, so each listed dir holds exactly one data file).
    * Persist it with [[writeManifest]]; Spark's parquet reader skips
    * `_`-prefixed dirs, so manifests can live under the table root. */
  def writeFiles(frame: DataFrame, rankCol: String, nFiles: Int,
      offset: Int, out: String, mode: String = "overwrite",
      rpfOverride: Long = -1L, idCol: String = "doc_id"): DataFrame = {
    val s = frame.sparkSession
    import s.implicits._
    val nF = frame.agg(count(lit(1)).as("_n"))
    val rpfCol =
      if (rpfOverride >= 1L) lit(rpfOverride)
      else expr(s"(_n + ${nFiles - 1}) div $nFiles")
    // pinned so the write and the write-time stats aggregate are two
    // consumers of ONE materialization (never two computations that
    // could disagree on file assignment)
    val staged = Pin.pin(frame.crossJoin(broadcast(nF))
      .withColumn("_rpf", rpfCol)
      .select(col(idCol), col("b1"), col("b2"),
        (lit(offset) + expr(s"($rankCol - 1) div _rpf")).as("file_id"),
        col(rankCol).as("_ord")))
    staged
      .repartition(col("file_id"))
      .sortWithinPartitions(col("file_id"), col("_ord"))
      .drop("_ord")
      .write.mode(mode).partitionBy("file_id").parquet(out)
    val stats = staged.groupBy(col("file_id"))
      .agg(min(col("b1")).as("b1_min"), max(col("b1")).as("b1_max"),
        min(col("b2")).as("b2_min"), max(col("b2")).as("b2_max"),
        count(lit(1)).as("n_rows"))
      .collect() // ≤ nFiles rows — table-format metadata, not data
    val conf = s.sparkContext.hadoopConfiguration
    val rows = stats.map { r =>
      val id = r.getAs[Long]("file_id")
      val dirP = new org.apache.hadoop.fs.Path(s"$out/file_id=$id")
      val data = dirP.getFileSystem(conf).listStatus(dirP).map(_.getPath)
        .filter(p => !p.getName.startsWith("_") && !p.getName.startsWith("."))
      require(data.length == 1,
        s"expected one data file under $dirP, found ${data.length}")
      (id, data.head.toString, r.getAs[Long]("b1_min"),
        r.getAs[Long]("b1_max"), r.getAs[Long]("b2_min"),
        r.getAs[Long]("b2_max"), r.getAs[Long]("n_rows"))
    }.toSeq.sortBy(_._1)
    rows.toDF("file_id", "path", "b1_min", "b1_max", "b2_min", "b2_max",
      "n_rows")
  }

  /** Persist a [[writeFiles]] stats manifest (one small file — the
    * transaction-log role: the reader prunes from this metadata without
    * touching data files). */
  def writeManifest(st: DataFrame, path: String): Unit =
    st.coalesce(1).write.mode("overwrite").parquet(path)

  /** The manifest rows whose stats box intersects the
    * [lo1,hi1]×[lo2,hi2] query box — the reader's skip decision,
    * metadata only. */
  def pruneManifest(rows: Array[Row], lo1: Long, hi1: Long, lo2: Long,
      hi2: Long): Array[Row] =
    rows.filter(r => r.getAs[Long]("b1_max") >= lo1 &&
      r.getAs[Long]("b1_min") <= hi1 && r.getAs[Long]("b2_max") >= lo2 &&
      r.getAs[Long]("b2_min") <= hi2)

  /** Incremental OPTIMIZE: given the table's current manifest and the
    * predicate marking which manifest rows are the UNSORTED appended
    * files, select the rewrite set FROM THE MANIFEST ALONE (files whose
    * stats box intersects the appended files' bounding box), read ONLY
    * those files, re-z-order them (zkey re-derived row-locally) into
    * new files at `newOffset` sized by the table's global rows-per-file
    * (ceil(totalRows/64ths) unless `rpf` given), and return the new
    * manifest (kept rows ∪ new-file rows) plus the rewrite accounting.
    * Base files outside the appended key region are never read OR
    * written. */
  def incrementalOptimize(s: SparkSession, manifest: DataFrame,
      isAppended: Row => Boolean, tablePath: String, newOffset: Int,
      rpf: Long = -1L, idCol: String = "doc_id")
      : (DataFrame, Long, Long) = {
    val man = manifest.collect()
    val app = man.filter(isAppended)
    require(app.nonEmpty, "no appended files to optimize")
    val (a1, a2) = (app.map(_.getAs[Long]("b1_min")).min,
      app.map(_.getAs[Long]("b1_max")).max)
    val (a3, a4) = (app.map(_.getAs[Long]("b2_min")).min,
      app.map(_.getAs[Long]("b2_max")).max)
    val rewrite = pruneManifest(man, a1, a2, a3, a4)
    val rwIds = rewrite.map(_.getAs[Long]("file_id")).toSet
    val rpfG =
      if (rpf >= 1L) rpf
      else (man.map(_.getAs[Long]("n_rows")).sum + 63L) / 64L
    // the only data read of the whole compaction: the rewrite set
    val rw = s.read
      .parquet(rewrite.map(_.getAs[String]("path")).sorted.toSeq: _*)
      .select(col(idCol), col("b1"), col("b2"))
      .withColumn("zkey", zkeyExpr)
    val stNew = writeFiles(
      Ranks.globalRowNumber(rw, Seq(col("zkey"), col(idCol)), out = "_rk"),
      "_rk", nFiles = 64, offset = newOffset, out = tablePath,
      mode = "append", rpfOverride = rpfG, idCol = idCol)
    val keep = manifest.where(!col("file_id").isInCollection(rwIds))
    (keep.unionByName(stNew), rewrite.length.toLong,
      rewrite.map(_.getAs[Long]("n_rows")).sum)
  }

  /** VACUUM: delete every data file under `tablePath` that the given
    * (newest) manifest no longer references — selection is a
    * listing-vs-manifest diff, metadata only. Earlier manifest
    * snapshots become time-travel-expired (the Delta VACUUM contract).
    * Returns (files on disk before, files deleted). */
  def vacuum(s: SparkSession, tablePath: String,
      manifest: DataFrame): (Long, Long) = {
    val live = manifest.select(col("path")).collect()
      .map(_.getString(0)).toSet
    val conf = s.sparkContext.hadoopConfiguration
    val tableP = new org.apache.hadoop.fs.Path(tablePath)
    val fs = tableP.getFileSystem(conf)
    val all = listDataFiles(s, tablePath)
    val dead = all.filterNot(live)
    dead.foreach(f =>
      fs.delete(new org.apache.hadoop.fs.Path(f), false): Unit)
    (all.length.toLong, dead.length.toLong)
  }

  /** All data-file paths under the table's file_id partitions
    * (listing only). */
  def listDataFiles(s: SparkSession, tablePath: String): Array[String] = {
    val conf = s.sparkContext.hadoopConfiguration
    val tableP = new org.apache.hadoop.fs.Path(tablePath)
    val fs = tableP.getFileSystem(conf)
    if (!fs.exists(tableP)) return Array.empty
    fs.listStatus(tableP).filter(_.isDirectory)
      .filter(_.getPath.getName.startsWith("file_id="))
      .flatMap(d => fs.listStatus(d.getPath)).map(_.getPath)
      .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(_.toString)
  }
}
