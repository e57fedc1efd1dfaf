package graft.merge

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Copy-on-write Parquet table with a tiny JSON commit log — the engine's
  * stand-in for the Delta features the reference leans on (mergeSchema,
  * operationMetrics, txnAppId/txnVersion idempotency; reference
  * M/commons/Task.scala:96,215,264-266 and
  * M/writter/config/WriteStreamConfig.scala:39-47).
  *
  * Layout:
  * {{{
  *   <root>/data/...                partitioned parquet (stable directory)
  *   <root>/snap/v00042/...         unpartitioned snapshots (one dir per commit)
  *   <root>/_graft_log/00042.json   commit entries (metrics, txn, partitions)
  * }}}
  *
  * Scale design: partitioned tables are updated with DYNAMIC PARTITION
  * OVERWRITE, so a merge rewrites only the partitions the update batch
  * touches (the manual DPP the reference splices into its merge conditions,
  * ref M/utility/Utility.scala:339-348) — on a 100 TB table a CDC batch that
  * touches 3 of 10k partitions rewrites 0.03% of the data. Unpartitioned
  * tables fall back to full-snapshot COW with an atomic log append as the
  * commit point. Readers resolve the latest snapshot from the log, so a
  * failed half-written snapshot directory is never visible.
  */
object ParquetTable {
  // One JVM-wide monitor per table root: multiple pipelines (IngestionJob
  // fan-out, shared Journal tables) commit from different driver threads;
  // without this, two writers read the same latestVersion and race the
  // commit file / _temporary staging dirs. Cross-process writers would need
  // a real lock service — out of scope for a single-driver engine.
  private val monitors = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private[merge] def monitorFor(root: String): Object =
    monitors.computeIfAbsent(root, _ => new Object)
}

final class ParquetTable(val spark: SparkSession, val root: String,
                         val partitionKeys: Seq[String] = Nil) {
  private val dataDir = s"$root/data"
  private val snapDir = s"$root/snap"
  private val logDir = s"$root/_graft_log"
  private val monitor = ParquetTable.monitorFor(root)
  /** Commit files are immutable once written — cache parsed entries so a
    * long-running stream's per-batch seenTxn doesn't re-read the whole log. */
  private val entryCache =
    new java.util.concurrent.ConcurrentHashMap[Long, Map[String, String]]()

  def exists: Boolean = Files.exists(Paths.get(logDir)) && latestVersion >= 0

  /** Serialize a multi-step read-decide-write section (e.g. the SCD writers'
    * exists-check + create/merge) against other writers of this table —
    * without this, two concurrent bootstraps both observe `!exists` and the
    * second CREATE clobbers the first. The commit methods take the same
    * (reentrant) monitor, so nesting is safe. */
  def withLock[T](f: => T): T = monitor.synchronized(f)

  def latestVersion: Long = {
    val p = Paths.get(logDir)
    if (!Files.exists(p)) return -1L
    val stream = Files.list(p)
    try stream.iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json").toLong)
      .foldLeft(-1L)(math.max)
    finally stream.close()
  }

  private def commitEntry(version: Long): Option[Map[String, String]] = {
    val cached = entryCache.get(version)
    if (cached != null) return Some(cached)
    val f = Paths.get(logDir, f"$version%05d.json")
    if (!Files.exists(f)) None
    else {
      val e = parseFlatJson(new String(Files.readAllBytes(f), StandardCharsets.UTF_8))
      entryCache.put(version, e)
      Some(e)
    }
  }

  /** appId -> highest committed txnVersion. Folded forward incrementally
    * (only log versions past `txnScannedThrough` are ever parsed), and
    * updated directly on each commit — so a long-running stream's per-batch
    * [[seenTxn]] probe is O(1), not O(commits). All access is under
    * `monitor`. */
  private val txnHighWater = scala.collection.mutable.HashMap[String, Long]()
  private var txnScannedThrough: Long = -1L

  private def foldTxnThrough(latest: Long): Unit = {
    var v = txnScannedThrough + 1
    while (v <= latest) {
      commitEntry(v).foreach { e =>
        for (a <- e.get("txnAppId"); tv <- e.get("txnVersion"))
          txnHighWater(a) = math.max(txnHighWater.getOrElse(a, Long.MinValue), tv.toLong)
      }
      v += 1
    }
    txnScannedThrough = math.max(txnScannedThrough, latest)
  }

  /** Idempotency check for exactly-once foreachBatch commits: has this app
    * already committed `version` (or anything newer)? Txn versions are
    * monotonically increasing per appId — the Delta idempotent-writer
    * contract the reference relies on — so `version <= high-water` means
    * "already applied, skip the replay". */
  def seenTxn(appId: String, version: Long): Boolean = monitor.synchronized {
    foldTxnThrough(latestVersion)
    txnHighWater.get(appId).exists(version <= _)
  }

  def read: DataFrame = {
    require(exists, s"table $root does not exist")
    if (partitionKeys.nonEmpty) spark.read.parquet(dataDir)
    else spark.read.parquet(f"$snapDir/v${latestVersion}%05d")
  }

  /** Distinct partition-key tuples present in a batch (the manual-DPP driver
    * list, ref M/utility/Utility.scala:339-348). Bounded: one row per touched
    * partition, not per batch row. */
  private def touchedPartitions(batch: DataFrame): Array[org.apache.spark.sql.Row] =
    batch.select(partitionKeys.map(col): _*).distinct().collect()

  private def prunerFor(touched: Array[org.apache.spark.sql.Row]): org.apache.spark.sql.Column =
    touched.foldLeft(lit(false)) { (acc, row) =>
      val one = partitionKeys.zipWithIndex.map { case (k, i) =>
        if (row.isNullAt(i)) col(k).isNull else col(k) === lit(row.get(i))
      }.reduce(_ && _)
      acc || one
    }

  /** The table restricted to the partitions `batch` touches — the same manual
    * DPP `merge` applies, exposed so callers that stage multi-step merge
    * sources (SCD2's rows-to-insert probe, SCD4's history snapshot join) can
    * bound their target READS as well as the rewrite. Falls back to a full
    * read for unpartitioned tables. */
  def readPruned(batch: DataFrame): DataFrame =
    if (partitionKeys.isEmpty) read
    else read.filter(prunerFor(touchedPartitions(batch)))

  /** Create with initial contents (ref create-if-absent probe `checkTable`,
    * M/utility/Utility.scala:361-371). The creating batch's txn is recorded
    * so a checkpoint replay of batch 0 is skipped like any other batch. */
  def create(df: DataFrame, metrics: Map[String, String] = Map.empty,
             txn: Option[(String, Long)] = None): Unit = monitor.synchronized {
    if (partitionKeys.nonEmpty)
      df.write.mode(SaveMode.Overwrite).partitionBy(partitionKeys: _*).parquet(dataDir)
    else
      df.write.mode(SaveMode.Overwrite).parquet(f"$snapDir/v${0}%05d")
    writeCommit(0L, "CREATE", metrics, txn)
  }

  /** Append rows (bookkeeping tables, SCD4 history). Schema union on write
    * replaces Delta's `mergeSchema`. */
  def append(df: DataFrame, metrics: Map[String, String] = Map.empty,
             txn: Option[(String, Long)] = None): Unit = monitor.synchronized {
    if (txn.exists { case (a, v) => seenTxn(a, v) }) return
    if (!exists) { create(df, metrics, txn); return } // keep the batch's idempotency record
    if (partitionKeys.nonEmpty) {
      val aligned = alignSchema(df)
      aligned.write.mode(SaveMode.Append).partitionBy(partitionKeys: _*).parquet(dataDir)
      writeCommit(latestVersion + 1, "APPEND", metrics, txn)
    } else {
      val next = latestVersion + 1
      val cur = read
      unionMergeSchema(cur, df).write.mode(SaveMode.Overwrite).parquet(f"$snapDir/v$next%05d")
      writeCommit(next, "APPEND", metrics, txn)
    }
  }

  /** MERGE the update batch in.
    *
    * CONTRACT (standard for hive-partitioned tables): partition-key values
    * are immutable under updates. The manual DPP below scans only the
    * partitions named by the update batch's CURRENT values — an update that
    * moved a row's partition key would leave the stale row in its old
    * partition unscanned (choose stable columns as partition keys).
    *
    * CRASH SEMANTICS differ by layout. Unpartitioned (snapshot) tables are
    * ATOMIC: data lands in a fresh `snap/vNNNNN` dir and only the commit-log
    * record makes it visible, so a crash in between leaves the previous
    * version readable (StreamingSpec "crash between data write and commit
    * log"). Partitioned tables rewrite touched partitions IN PLACE (dynamic
    * overwrite), so a crash in the same window leaves the new data visible
    * with the commit log behind — the guarantee is the weaker idempotent-
    * replay one: the checkpoint re-runs the batch, the merge re-applies
    * over the half-committed state to the same result, and the txn record
    * then closes the window (StreamingSpec "partitioned table: crash after
    * data write"). Callers needing point-in-time atomicity should use the
    * snapshot layout. */
  def merge(updates: DataFrame, condition: String,
            matched: Seq[MergeInto.WhenMatched],
            notMatched: Seq[MergeInto.WhenNotMatched],
            txn: Option[(String, Long)] = None,
            metrics: Map[String, String] = Map.empty): Unit = monitor.synchronized {
    if (txn.exists { case (a, v) => seenTxn(a, v) }) return
    require(exists, s"merge target $root does not exist")

    if (partitionKeys.nonEmpty) {
      // Manual DPP (ref M/utility/Utility.scala:339-348): the distinct
      // partition-key values of the update batch bound BOTH the target read
      // and the rewrite — only touched partitions are scanned and replaced.
      val touched = touchedPartitions(updates)
      val targetTouched = read.filter(prunerFor(touched))
      val merged = MergeInto(targetTouched, updates, condition, matched, notMatched)
      rewriteTouchedPartitions(touched, merged, "MERGE", metrics, txn)
    } else {
      val merged = MergeInto(read, updates, condition, matched, notMatched)
      val next = latestVersion + 1
      merged.write.mode(SaveMode.Overwrite).parquet(f"$snapDir/v$next%05d")
      writeCommit(next, "MERGE", metrics, txn)
    }
  }

  /** The partitioned copy-on-write rewrite shared by [[merge]] and
    * [[delete]]: dynamic-overwrite only the touched partitions with
    * `newContent`, then explicitly drop touched partitions whose rows all
    * vanished (dynamic overwrite cannot see them — they are absent from
    * the write). */
  private def rewriteTouchedPartitions(touched: Array[org.apache.spark.sql.Row],
                                       newContent: DataFrame, action: String,
                                       metrics: Map[String, String],
                                       txn: Option[(String, Long)]): Unit = {
    val content = newContent
      .localCheckpoint() // materialize BEFORE overwriting the dirs we read from
    // per-WRITER dynamic overwrite: mutating the session conf would leak
    // into other tables' concurrent writers (their full overwrites would
    // silently keep partitions they meant to drop)
    content.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionKeys: _*).parquet(dataDir)
    // Dynamic overwrite replaces exactly the partitions present in the
    // content; a touched partition whose rows were ALL deleted is absent
    // from the write and must be dropped explicitly.
    val remaining = content.select(partitionKeys.map(col): _*).distinct().collect()
      .map(_.toSeq).toSet
    touched.map(_.toSeq).filterNot(remaining.contains).foreach { vals =>
      // Spark writes Hive-ESCAPED partition dir names (':' -> '%3A' etc.);
      // raw toString would miss those dirs and resurrect deleted rows
      val rel = partitionKeys.zip(vals).map { case (k, v) =>
        if (v == null) s"$k=__HIVE_DEFAULT_PARTITION__"
        else org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .getPartitionPathString(k, v.toString)
      }.mkString("/")
      deleteRecursively(Paths.get(dataDir, rel))
    }
    writeCommit(latestVersion + 1, action, metrics, txn)
  }

  /** `DELETE WHERE condition` — the GDPR-erasure primitive on the COW
    * table. SQL DELETE semantics: rows where the predicate is TRUE go;
    * FALSE and NULL rows stay. Partitioned tables rewrite ONLY the
    * partitions that contain matching rows (the same manual-DPP bound as
    * [[merge]] — an erasure request touching one user never rewrites the
    * whole table); snapshot tables write the kept rows as a new version.
    * Records a DELETE commit either way, so [[lastMetrics]] carries the
    * caller's audit numbers and a no-match delete is still a visible,
    * idempotency-checkable operation. */
  def delete(condition: String,
             metrics: Map[String, String] = Map.empty,
             txn: Option[(String, Long)] = None): Unit = monitor.synchronized {
    if (txn.exists { case (a, v) => seenTxn(a, v) }) return
    require(exists, s"delete target $root does not exist")
    val hit = coalesce(expr(condition), lit(false))
    if (partitionKeys.nonEmpty) {
      val touched = touchedPartitions(read.filter(hit))
      if (touched.isEmpty) writeCommit(latestVersion + 1, "DELETE", metrics, txn)
      else {
        val kept = read.filter(prunerFor(touched)).filter(!hit)
        rewriteTouchedPartitions(touched, kept, "DELETE", metrics, txn)
      }
    } else {
      val next = latestVersion + 1
      read.filter(!hit).write.mode(SaveMode.Overwrite)
        .parquet(f"$snapDir/v$next%05d")
      writeCommit(next, "DELETE", metrics, txn)
    }
  }

  /** Retention cleanup — Delta `VACUUM`'s equivalent for the SNAPSHOT
    * layout: physically drop all snapshot versions older than the
    * `keepLast` most recent (the current version is always kept). The
    * commit LOG stays intact — history remains auditable, only the data
    * bytes of expired versions go, which is the actual storage-cost and
    * GDPR point of vacuuming (a deleted row's bytes otherwise live on in
    * old snapshots indefinitely). Partitioned tables rewrite in place
    * (one live copy), so vacuum is a no-op there. */
  def vacuum(keepLast: Int = 1): Unit = monitor.synchronized {
    require(keepLast >= 1, "keepLast >= 1")
    if (partitionKeys.nonEmpty || !Files.exists(Paths.get(snapDir))) return
    val cutoff = latestVersion - keepLast + 1
    val listing = Files.list(Paths.get(snapDir))
    try listing.iterator().asScala
      .filter { p =>
        val n = p.getFileName.toString
        n.startsWith("v") && n.drop(1).forall(_.isDigit) &&
          n.drop(1).toLong < cutoff
      }
      .toList.foreach(deleteRecursively)
    finally listing.close()
  }

  /** Replace full contents (new snapshot / full overwrite). For PARTITIONED
    * tables the incoming plan may still lazily read this table's dataDir
    * (e.g. scd2Apply over table.read) — materialize it first, or Spark
    * refuses to overwrite a path being read. */
  def overwrite(df: DataFrame, metrics: Map[String, String] = Map.empty,
                txn: Option[(String, Long)] = None): Unit = monitor.synchronized {
    if (txn.exists { case (a, v) => seenTxn(a, v) }) return
    val next = math.max(latestVersion + 1, 0L)
    if (partitionKeys.nonEmpty)
      df.write.mode(SaveMode.Overwrite).partitionBy(partitionKeys: _*).parquet(dataDir)
    else
      df.write.mode(SaveMode.Overwrite).parquet(f"$snapDir/v$next%05d")
    writeCommit(next, "OVERWRITE", metrics, txn)
  }

  /** Bin-pack compaction — Delta `OPTIMIZE`'s equivalent on the COW table:
    * rewrites the CURRENT contents into ~`targetBytes` files and records a
    * COMPACT commit (files/bytes before and after in the metrics, readable
    * via [[lastMetrics]] like any other operation). Contents are unchanged —
    * only the file layout moves, which is what keeps a streamed-into table
    * scannable: a year of micro-batch appends leaves thousands of KB-sized
    * files whose per-file open/footer cost dominates the scan.
    *
    * Snapshot layout: the repartitioned contents land in a fresh
    * `snap/vNNNNN` (atomic visibility like every snapshot write).
    * Partitioned layout: rows are repartitioned BY THE PARTITION KEYS so
    * each partition value collapses to one task -> one file per partition
    * (the common small-file case: many appends x few partitions), then
    * dynamically overwritten in place. Skipped (no new version) when the
    * current layout is already within the target file count. */
  def compact(targetBytes: Long = 128L << 20,
              txn: Option[(String, Long)] = None): Unit = monitor.synchronized {
    if (txn.exists { case (a, v) => seenTxn(a, v) }) return
    require(exists, s"compact target $root does not exist")
    require(targetBytes > 0, "targetBytes > 0")
    val dir = if (partitionKeys.nonEmpty) dataDir
              else f"$snapDir/v${latestVersion}%05d"
    val files = Files.walk(Paths.get(dir)).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
      .toSeq
    val bytes = files.map(Files.size).sum
    val wantFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes)
    if (files.size <= wantFiles) return // already packed; no empty commit
    val metrics = Map(
      "filesBefore" -> files.size.toString, "bytesBefore" -> bytes.toString,
      "targetFiles" -> wantFiles.toString)
    val next = latestVersion + 1
    if (partitionKeys.nonEmpty) {
      // materialize before overwriting the directory being read (same
      // constraint as merge's COW rewrite)
      val packed = read
        .repartition(wantFiles.toInt, partitionKeys.map(col): _*)
        .localCheckpoint()
      packed.write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partitionKeys: _*).parquet(dataDir)
    } else {
      read.repartition(wantFiles.toInt)
        .write.mode(SaveMode.Overwrite).parquet(f"$snapDir/v$next%05d")
    }
    writeCommit(next, "COMPACT", metrics, txn)
  }

  /** Schema union (Delta `mergeSchema` equivalent): pad each side with the
    * other's missing columns as NULLs. */
  private def unionMergeSchema(a: DataFrame, b: DataFrame): DataFrame = {
    val aCols = a.columns.toSeq
    val bCols = b.columns.toSeq
    val all = aCols ++ bCols.filterNot(aCols.contains)
    def pad(df: DataFrame, have: Seq[String]) = {
      val bTypes = (a.schema ++ b.schema).map(f => f.name -> f.dataType).toMap
      df.select(all.map(c =>
        if (have.contains(c)) col(c) else lit(null).cast(bTypes(c)).as(c)): _*)
    }
    pad(a, aCols).unionByName(pad(b, bCols))
  }

  private def alignSchema(df: DataFrame): DataFrame = {
    val cur = read.schema
    val have = df.columns.toSet
    df.select(cur.map(f =>
      if (have.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)): _*)
  }

  /** TEST SEAM — crash injection for recovery tests: runs after a commit's
    * DATA files are on disk but before the commit-log record that makes them
    * visible (the exact window a mid-merge crash leaves open). Throwing here
    * simulates that crash; production value is a no-op. */
  private[graft] var onPreCommit: () => Unit = () => ()

  private def writeCommit(version: Long, action: String,
                          metrics: Map[String, String],
                          txn: Option[(String, Long)]): Unit = {
    onPreCommit()
    Files.createDirectories(Paths.get(logDir))
    val fields = Map("version" -> version.toString, "action" -> action) ++
      metrics.map { case (k, v) => s"metric:$k" -> v } ++
      txn.map { case (a, v) => Map("txnAppId" -> a, "txnVersion" -> v.toString) }
        .getOrElse(Map.empty)
    val json = fields.map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }
      .mkString("{", ",", "}")
    val tmp = Paths.get(logDir, f".$version%05d.json.tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(logDir, f"$version%05d.json"),
      StandardCopyOption.ATOMIC_MOVE)
    // keep the O(1) seenTxn map current without re-reading the file we just
    // wrote; earlier unscanned commits (if any) stay pending for foldTxnThrough
    txn.foreach { case (a, v) =>
      txnHighWater(a) = math.max(txnHighWater.getOrElse(a, Long.MinValue), v)
    }
    if (txnScannedThrough == version - 1) txnScannedThrough = version
  }

  /** Last commit's metrics — the `operationMetrics` equivalent the reference
    * reads via `describe history` (ref M/commons/Task.scala:264-266). */
  def lastMetrics: Map[String, String] =
    commitEntry(latestVersion).getOrElse(Map.empty)
      .collect { case (k, v) if k.startsWith("metric:") => k.stripPrefix("metric:") -> v }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (!Files.exists(p)) return
    Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
  }

  private def esc(s: String): String =
    s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString }

  private def parseFlatJson(s: String): Map[String, String] = {
    // flat {"k":"v",...} parser (we only ever write flat string maps)
    val re = """"((?:[^"\\]|\\.)*)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
    re.findAllMatchIn(s).map(m => unesc(m.group(1)) -> unesc(m.group(2))).toMap
  }
  private def unesc(s: String): String =
    s.replace("\\\"", "\"").replace("\\\\", "\\")
}
