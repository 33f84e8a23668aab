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
      rpfOverride: Long = -1L, idCol: String = "doc_id",
      dynamicOverwrite: Boolean = false): DataFrame = {
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
    // dynamicOverwrite: replace ONLY the file_id dirs this write
    // touches (Spark's dynamic partition-overwrite) — the retry-
    // idempotent data write a streaming appender needs: a replayed
    // batch rewrites exactly its own files, where mode "append" would
    // land a SECOND part file in each dir and corrupt later reads,
    // and a static overwrite would wipe the whole table.
    val writer = staged
      .repartition(col("file_id"))
      .sortWithinPartitions(col("file_id"), col("_ord"))
      .drop("_ord")
      .write.mode(if (dynamicOverwrite) "overwrite" else mode)
    (if (dynamicOverwrite) writer.option("partitionOverwriteMode", "dynamic")
     else writer)
      .partitionBy("file_id").parquet(out)
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

  // ------------------------------------------------------------------ //
  // Optimistic-concurrency manifest LOG (r15 VERDICT task 1): the       //
  // single overwritten manifest file loses one writer's rows when an    //
  // append and an incremental OPTIMIZE commit concurrently — and a      //
  // VACUUM against the lost-update manifest DELETES LIVE DATA. The log  //
  // below is the Delta-style fix in miniature: versioned snapshot       //
  // commits arbitrated by an atomic-exclusive claim file, readers pin   //
  // the newest COMPLETE version, appenders rebase on conflict, and an   //
  // optimizer whose read snapshot was superseded by an overlapping      //
  // commit ABORTS and re-selects — never corrupts the live file set.    //
  // ------------------------------------------------------------------ //

  /** Thrown by [[logCommit]] when another writer took the next version
    * slot first. Appenders rebase and retry; optimizers re-check their
    * selection against the new latest (see [[commitOptimize]]). */
  final case class ManifestConflict(expectedLatest: Long, foundLatest: Long)
    extends RuntimeException(
      s"manifest log advanced: expected latest v$expectedLatest, " +
        s"found v$foundLatest")

  /** Thrown by [[commitOptimize]] when a concurrent commit invalidated
    * the optimizer's read snapshot (a rewritten file was removed, or new
    * files landed inside the optimize box): the rewrite selection is
    * stale and the caller must RE-SELECT from the new latest — the
    * already-written attempt files become orphans that [[vacuum]]
    * reclaims (the Delta failed-txn discipline). */
  final class OptimizeSuperseded(msg: String) extends RuntimeException(msg)

  private def fsOf(s: SparkSession, p: String) =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Newest COMPLETE snapshot version in the log (readers' pin), or -1
    * on an empty log. A version is complete when its parquet `_SUCCESS`
    * exists — a claim whose writer crashed mid-snapshot is invisible to
    * readers (snapshot isolation over the claim-then-write window). */
  def logLatest(s: SparkSession, root: String): Long = {
    val fs = fsOf(s, root)
    val rootP = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(rootP)) return -1L
    fs.listStatus(rootP)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v="))
      .map(_.getPath)
      .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")))
      .map(_.getName.stripPrefix("v=").toLong)
      .foldLeft(-1L)(math.max)
  }

  /** The manifest snapshot at version `v`. */
  def logRead(s: SparkSession, root: String, v: Long): DataFrame =
    s.read.parquet(s"$root/v=$v")

  /** Commit `manifest` as version expectedLatest+1. The arbiter is an
    * ATOMIC-EXCLUSIVE create of `_claim_<n>` (HDFS/local `create` with
    * overwrite=false — exactly one writer can win a slot); losers get
    * [[ManifestConflict]] and must re-read. The snapshot parquet lands
    * AFTER the claim; readers only see it once `_SUCCESS` exists, so a
    * crash between claim and snapshot leaves an invisible (incomplete)
    * version — [[logRecover]] frees the slot. Returns the committed
    * version. */
  def logCommit(s: SparkSession, root: String, expectedLatest: Long,
      manifest: DataFrame): Long = {
    val fs = fsOf(s, root)
    fs.mkdirs(new org.apache.hadoop.fs.Path(root))
    val latest = logLatest(s, root)
    if (latest != expectedLatest) throw ManifestConflict(expectedLatest, latest)
    val next = expectedLatest + 1
    val claim = new org.apache.hadoop.fs.Path(s"$root/_claim_$next")
    try { fs.create(claim, false).close() }
    catch {
      case _: java.io.IOException =>
        throw ManifestConflict(expectedLatest, logLatest(s, root))
    }
    manifest.coalesce(1).write.mode("overwrite").parquet(s"$root/v=$next")
    next
  }

  /** Free claim slots whose snapshot never completed (a writer crashed
    * between claim and snapshot write). Safe ONLY when no writer is
    * live — the stale-lock cleanup every claim-based protocol needs. */
  def logRecover(s: SparkSession, root: String): Unit = {
    val fs = fsOf(s, root)
    val rootP = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(rootP)) return
    fs.listStatus(rootP)
      .filter(st => !st.isDirectory && st.getPath.getName.startsWith("_claim_"))
      .foreach { st =>
        val n = st.getPath.getName.stripPrefix("_claim_")
        val ok = new org.apache.hadoop.fs.Path(s"$root/v=$n/_SUCCESS")
        if (!fs.exists(ok)) { fs.delete(st.getPath, false): Unit }
      }
  }

  /** Append commit with rebase-on-conflict: an append conflicts with
    * NOTHING (it only adds rows), so when another writer takes the slot
    * first the append re-reads the new latest, re-unions its rows, and
    * retries — requiring only that its file_ids are globally fresh
    * (enforced here; a clash means the id-allocation contract broke and
    * blind union would corrupt). Returns the committed version. */
  def commitAppend(s: SparkSession, root: String, readVersion: Long,
      appended: DataFrame, maxRetries: Int = 5): Long = {
    val mine = appended.select(col("file_id")).collect()
      .map(_.getLong(0)).toSet
    var v = readVersion
    var tries = 0
    while (true) {
      val base = logRead(s, root, v)
      val clash = base.collect().map(_.getAs[Long]("file_id")).toSet & mine
      require(clash.isEmpty,
        s"append file_ids not fresh (already live): $clash")
      try return logCommit(s, root, v, base.unionByName(appended))
      catch {
        case c: ManifestConflict =>
          tries += 1
          if (tries > maxRetries) throw c
          v = logLatest(s, root)
      }
    }
    -1L // unreachable
  }

  /** Optimize commit with CONFLICT DETECTION: version readVersion's
    * snapshot drove the rewrite selection (`rewrittenIds`, chosen from
    * boxes intersecting `box`); by commit time other writers may have
    * advanced the log. The rebase rule: concurrent commits that only
    * touched files OUTSIDE the optimize box are harmless — rebase onto
    * the new latest (latest − rewrittenIds + newRows) and retry. But if
    * a rewritten file was REMOVED, or new files landed INSIDE the box
    * (they belonged in this rewrite), the selection is stale —
    * [[OptimizeSuperseded]] forces a re-select. The silent alternative
    * (overwriting the manifest computed from the stale snapshot) drops
    * the concurrent append's rows, and VACUUM then deletes its live
    * data files. Returns the committed version. */
  def commitOptimize(s: SparkSession, root: String, readVersion: Long,
      rewrittenIds: Set[Long], newRows: DataFrame,
      box: (Long, Long, Long, Long), maxRetries: Int = 5): Long = {
    val readIds = logRead(s, root, readVersion).collect()
      .map(_.getAs[Long]("file_id")).toSet
    var v = readVersion
    var tries = 0
    while (true) {
      val cur = logRead(s, root, v)
      val curRows = cur.collect()
      val curIds = curRows.map(_.getAs[Long]("file_id")).toSet
      if (!rewrittenIds.subsetOf(curIds))
        throw new OptimizeSuperseded("a rewritten file was removed by a " +
          s"concurrent commit: ${rewrittenIds -- curIds} no longer live")
      val addedInBox = curRows
        .filter(r => !readIds.contains(r.getAs[Long]("file_id")))
        .exists(r => r.getAs[Long]("b1_max") >= box._1 &&
          r.getAs[Long]("b1_min") <= box._2 &&
          r.getAs[Long]("b2_max") >= box._3 &&
          r.getAs[Long]("b2_min") <= box._4)
      if (addedInBox)
        throw new OptimizeSuperseded("a concurrent commit added files " +
          "inside the optimize box; the rewrite selection is stale")
      val rebased = cur
        .where(!col("file_id").isInCollection(rewrittenIds))
        .unionByName(newRows)
      try return logCommit(s, root, v, rebased)
      catch {
        case c: ManifestConflict =>
          tries += 1
          if (tries > maxRetries) throw c
          v = logLatest(s, root)
      }
    }
    -1L // unreachable
  }

  /** The bounding box of the manifest rows matching `isAppended` — the
    * rewrite-selection box [[incrementalOptimize]] derives internally,
    * exposed for the OCC path (callers pass it to [[commitOptimize]]). */
  def appendedBox(man: Array[Row], isAppended: Row => Boolean)
      : (Long, Long, Long, Long) = {
    val app = man.filter(isAppended)
    require(app.nonEmpty, "no appended files to optimize")
    (app.map(_.getAs[Long]("b1_min")).min,
      app.map(_.getAs[Long]("b1_max")).max,
      app.map(_.getAs[Long]("b2_min")).min,
      app.map(_.getAs[Long]("b2_max")).max)
  }

  /** The full OCC optimize loop: select from the log's latest snapshot,
    * rewrite, [[commitOptimize]]; on [[OptimizeSuperseded]] RE-SELECT
    * from the fresh latest (attempt files of the superseded try become
    * vacuum-reclaimable orphans) with the next attempt's file ids at
    * `newOffset + attempt·attemptStride`. Returns (committed version,
    * files rewritten, rows rewritten, aborts). */
  def incrementalOptimizeOcc(s: SparkSession, root: String,
      tablePath: String, isAppended: Row => Boolean, newOffset: Int,
      rpf: Long = -1L, idCol: String = "doc_id", maxAttempts: Int = 3,
      attemptStride: Int = 1000): (Long, Long, Long, Long) = {
    var attempt = 0
    while (true) {
      val v = logLatest(s, root)
      val man = logRead(s, root, v).collect()
      val box = appendedBox(man, isAppended)
      val rewrite = pruneManifest(man, box._1, box._2, box._3, box._4)
      val rwIds = rewrite.map(_.getAs[Long]("file_id")).toSet
      val rpfG =
        if (rpf >= 1L) rpf
        else (man.map(_.getAs[Long]("n_rows")).sum + 63L) / 64L
      val rw = s.read
        .parquet(rewrite.map(_.getAs[String]("path")).sorted.toSeq: _*)
        .select(col(idCol), col("b1"), col("b2"))
        .withColumn("zkey", zkeyExpr)
      val stNew = writeFiles(
        Ranks.globalRowNumber(rw, Seq(col("zkey"), col(idCol)), out = "_rk"),
        "_rk", nFiles = 64, offset = newOffset + attempt * attemptStride,
        out = tablePath, mode = "append", rpfOverride = rpfG, idCol = idCol)
      try {
        val nv = commitOptimize(s, root, v, rwIds, stNew, box)
        return (nv, rewrite.length.toLong,
          rewrite.map(_.getAs[Long]("n_rows")).sum, attempt.toLong)
      } catch {
        case e: OptimizeSuperseded =>
          attempt += 1
          if (attempt >= maxAttempts) throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Retention-bounded VACUUM (time travel): delete every data file
    * under `tablePath` referenced by NO log snapshot with version ≥
    * `fromVersion`. Snapshots inside the retention window stay fully
    * readable afterwards — [[logRead]] at any retained version plus its
    * manifest's file set IS the time-travel read — while older versions
    * become time-travel-expired (the Delta `VACUUM ... RETAIN` contract,
    * where retention is an age; here it is an explicit version floor).
    * Selection is a listing-vs-log diff over ≤ (versions × files)
    * metadata rows. Returns (files on disk before, files deleted). */
  def vacuumRetain(s: SparkSession, tablePath: String, root: String,
      fromVersion: Long): (Long, Long) = {
    val latest = logLatest(s, root)
    require(fromVersion >= 0 && fromVersion <= latest,
      s"retention floor v$fromVersion outside the log [0, v$latest]")
    val live = (fromVersion to latest).flatMap(v =>
      logRead(s, root, v).select(col("path")).collect()
        .map(_.getString(0))).toSet
    val conf = s.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(tablePath).getFileSystem(conf)
    val all = listDataFiles(s, tablePath)
    val dead = all.filterNot(live)
    dead.foreach(f =>
      fs.delete(new org.apache.hadoop.fs.Path(f), false): Unit)
    (all.length.toLong, dead.length.toLong)
  }

  /** Whether the log's snapshot at `v` already carries transaction
    * (`txnApp`, `txnV`) — the Delta txnAppId/txnVersion dedup check
    * that makes at-least-once micro-batch delivery exactly-once at the
    * table: a replayed batch sees its own marker and commits nothing. */
  def txnCommitted(s: SparkSession, root: String, v: Long,
      txnApp: String, txnV: Long): Boolean =
    v >= 0 && {
      val b = logRead(s, root, v)
      b.columns.contains("txn_app") &&
        b.where(col("txn_app") === txnApp && col("txn_v") === txnV)
          .limit(1).count() > 0
    }

  /** [[commitAppend]] stamped with a transaction marker: the appended
    * manifest rows carry (`txnApp`, `txnV`), and a commit whose marker
    * is already present in the latest snapshot is SKIPPED — the retry
    * short-circuit of a replayed micro-batch whose previous attempt
    * crashed after its commit. Rebase-on-conflict re-checks the marker
    * against each fresh latest (the conflicting writer may have been
    * this batch's own earlier attempt). Base snapshots without txn
    * columns align via null-filled union. Returns (version holding the
    * txn, whether THIS call committed it). */
  def commitAppendTxn(s: SparkSession, root: String, txnApp: String,
      txnV: Long, appended: DataFrame, maxRetries: Int = 5)
      : (Long, Boolean) = {
    val stamped = appended
      .withColumn("txn_app", lit(txnApp))
      .withColumn("txn_v", lit(txnV))
    val mine = appended.select(col("file_id")).collect()
      .map(_.getLong(0)).toSet
    var v = logLatest(s, root)
    var tries = 0
    while (true) {
      if (txnCommitted(s, root, v, txnApp, txnV)) return (v, false)
      val next =
        if (v < 0) stamped
        else {
          val base = logRead(s, root, v)
          val clash = base.collect().map(_.getAs[Long]("file_id")).toSet & mine
          require(clash.isEmpty,
            s"append file_ids not fresh (already live): $clash")
          base.unionByName(stamped, allowMissingColumns = true)
        }
      try return (logCommit(s, root, v, next), true)
      catch {
        case c: ManifestConflict =>
          tries += 1
          if (tries > maxRetries) throw c
          v = logLatest(s, root)
      }
    }
    (-1L, false) // unreachable
  }

  /** Exactly-once micro-batch append into a logged table — the
    * streaming writer's whole commit path, retry-safe at BOTH layers:
    * the txn-marker check runs BEFORE any data write (a post-commit
    * replay writes nothing at all), and the data write uses dynamic
    * partition overwrite of the batch's own file_id dirs (a pre-commit
    * replay — crashed after data landed, before the log advanced —
    * rewrites exactly itself, never doubling a file dir the way a plain
    * append would). Callers derive `offset` from the batch id so file
    * ids are a pure function of the batch (fresh across batches,
    * stable across retries). Returns (version holding the txn, whether
    * THIS call committed it). */
  def appendBatchTxn(s: SparkSession, tablePath: String, root: String,
      txnApp: String, txnV: Long, ranked: DataFrame, rankCol: String,
      nFiles: Int, offset: Int, idCol: String = "doc_id")
      : (Long, Boolean) = {
    val v = logLatest(s, root)
    if (txnCommitted(s, root, v, txnApp, txnV)) return (v, false)
    val st = writeFiles(ranked, rankCol, nFiles, offset, tablePath,
      idCol = idCol, dynamicOverwrite = true)
    commitAppendTxn(s, root, txnApp, txnV, st)
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
