package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

import graft.merge.{MergeInto, ParquetTable, Scd}

/** Declarative stream-writer configuration, mirroring the reference's
  * WriteStreamConfig (reference M/writter/config/WriteStreamConfig.scala:
  * 6-65): checkpoint location, output mode, format, partition columns,
  * trigger, txn identity for idempotent writes, free-form extra options.
  *
  * `txnAppId` replaces Delta's txnVersion/txnAppId pair: our commit path
  * records (appId, batchId) in the ParquetTable log and skips replays.
  */
final case class WriteStreamConfig(
    checkpointLocation: String,
    outputMode: String = "update",
    format: String = "parquet",
    partitionBy: Seq[String] = Nil,
    triggerMode: String = "AvailableNow",   // ProcessingTime | Once | AvailableNow
    triggerDuration: String = "2 minutes",
    txnAppId: Option[String] = None,
    extraOptions: Map[String, String] = Map.empty) {

  def trigger: Trigger = triggerMode match {
    case "ProcessingTime" => Trigger.ProcessingTime(triggerDuration)
    case "Once" => Trigger.Once()
    case _ => Trigger.AvailableNow()
  }

  def applyOptions[T](w: DataStreamWriter[T]): DataStreamWriter[T] = {
    val base = w.outputMode(outputMode)
      .option("checkpointLocation", checkpointLocation)
      .trigger(trigger)
      .options(extraOptions)
    if (partitionBy.nonEmpty) base.partitionBy(partitionBy: _*) else base
  }
}

/** foreachBatch SCD sinks — the streaming twins of the batch SCD writers
  * (reference M/writter/DeltaWritter.scala:21-169 wrapping
  * M/utility/Utility.scala:731-1045). Each micro-batch merges into the
  * target ParquetTable; exactly-once comes from the checkpoint (batch replay
  * after crash) + the (appId, batchId) txn record (replayed batches are
  * skipped by the commit log).
  */
object StreamSink {

  def scd1Batch(table: ParquetTable, keySpecs: Seq[String],
                matched: Seq[MergeInto.WhenMatched] = Seq(MergeInto.WhenMatched(None, MergeInto.UpdateAll)),
                notMatched: Seq[MergeInto.WhenNotMatched] = Seq(MergeInto.WhenNotMatched(None, MergeInto.InsertAll)),
                dedupOrderCols: Seq[String] = Nil,
                appId: String = null): (DataFrame, Long) => Unit = {
    // default appId is scoped to the table root: a fixed constant would make
    // two queries (or a wiped checkpoint) collide on (appId, batchId) and
    // silently skip real batches as replays
    val id = Option(appId).getOrElse(s"graft-scd1:${table.root}")
    (batch, batchId) =>
      Scd.writeScd1(table, batch, keySpecs, matched, notMatched, dedupOrderCols,
        txn = Some((id, batchId)))
  }

  def scd2Batch(table: ParquetTable, keySpecs: Seq[String],
                matchCondition: String,
                updateMap: Map[String, String], insertMap: Map[String, String],
                dedupOrderCols: Seq[String] = Nil,
                appId: String = null): (DataFrame, Long) => Unit = {
    val id = Option(appId).getOrElse(s"graft-scd2:${table.root}")
    (batch, batchId) =>
      Scd.writeScd2(table, batch, keySpecs, matchCondition, updateMap, insertMap,
        dedupOrderCols, txn = Some((id, batchId)))
  }

  def scd4Batch(current: ParquetTable, history: ParquetTable, keySpecs: Seq[String],
                updatedAtCol: String = "updated_at",
                dedupOrderCols: Seq[String] = Nil,
                appId: String = null): (DataFrame, Long) => Unit = {
    val id = Option(appId).getOrElse(s"graft-scd4:${current.root}")
    (batch, batchId) =>
      Scd.writeScd4(current, history, batch, keySpecs, updatedAtCol, dedupOrderCols,
        txn = Some((id, batchId)))
  }

  /** Continuous exact-dedup ingestion: each micro-batch keeps only rows
    * whose `textCol` fingerprint is new — first against the rows ALREADY IN
    * the target (left_anti on the md5 fingerprint, via
    * [[graft.operators.Dedup.incrementalNew]]), then within the batch
    * itself (first row per fingerprint by `idCol`) — and appends the
    * survivors. Replays are no-ops through the (appId, batchId) txn record.
    * Scale: the anti-join shuffles on the 128-bit fingerprint; at 100 TB
    * the target side should be a pre-computed fingerprint column (it is
    * here: the fingerprint is persisted with each row), so each batch joins
    * against fingerprints, never re-hashes the corpus. */
  def dedupAppendBatch(table: ParquetTable, textCol: String, idCol: String,
                       appId: String = null): (DataFrame, Long) => Unit = {
    val id = Option(appId).getOrElse(s"graft-dedup-append:${table.root}")
    (batch, batchId) => table.withLock {
      if (!table.seenTxn(id, batchId)) {
        import org.apache.spark.sql.functions._
        val fresh =
          if (!table.exists) batch.withColumn("__fp", md5(col(textCol)))
          else {
            val seen = table.read.select(col("__fp")).distinct()
            batch.withColumn("__fp", md5(col(textCol)))
              .join(seen, Seq("__fp"), "left_anti")
          }
        // ONE row per new fingerprint, deterministically (min id)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("__fp")).orderBy(col(idCol))
        val deduped = fresh.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
          // materialize BEFORE appending into the directory the anti-join reads
          .localCheckpoint()
        table.append(deduped, txn = Some((id, batchId)))
      }
    }
  }

  /** Start a foreachBatch stream with the declarative config (ref
    * ProcessOutputStream.processOutputStreamBatch,
    * M/writter/ProcessOutputStream.scala:50-76). */
  def startForeachBatch(df: DataFrame, cfg: WriteStreamConfig,
                        fn: (DataFrame, Long) => Unit): StreamingQuery =
    cfg.applyOptions(
      df.writeStream.foreachBatch((b: org.apache.spark.sql.Dataset[Row], id: Long) =>
        fn(b.toDF(), id))
    ).start()

  /** Per-batch error containment (ref M/commons/Task.scala:90-191 +
    * streamingStoreStatusAndExit): on batch failure, journal the offending
    * batch rows into pipeline_error_logs and the failure into
    * pipeline_status, then rethrow so the query stops rather than silently
    * dropping a batch. */
  def withJournal(fn: (DataFrame, Long) => Unit,
                  journal: graft.pipeline.Journal,
                  pipelineDefId: String,
                  taskName: String): (DataFrame, Long) => Unit =
    (batch, batchId) =>
      try {
        fn(batch, batchId)
        journal.logStatus(pipelineDefId, taskName, "Finished", s"batch $batchId")
      } catch {
        case e: Throwable =>
          try {
            journal.logErrorRows(pipelineDefId, batch, e.toString)
            journal.logStatus(pipelineDefId, taskName, "Error",
              s"batch $batchId: ${e.getMessage}")
          } catch { case _: Throwable => () } // journaling must not mask the failure
          throw e
      }

  /** Plain append stream to a parquet path (ref StreamDeltaWritterAppendSCD*,
    * M/writter/DeltaWritter.scala:324-443: history-load append with fixed
    * trigger + per-table checkpoint). */
  def startAppend(df: DataFrame, cfg: WriteStreamConfig, path: String): StreamingQuery =
    // append is forced: file sinks reject the config default ("update")
    cfg.applyOptions(df.writeStream.format(cfg.format))
      .outputMode("append").start(path)
}
