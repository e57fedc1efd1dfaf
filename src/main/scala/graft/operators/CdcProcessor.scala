package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{AesCodec, Crypto, Hashes, Pii}

/** The processor stage of a CDC pipeline — the reference's BaseProcessor
  * composition (reference M/processor/BaseProcessor.scala:28-116): demuxed
  * CDC rows are enriched with their shard, stripped of omitted columns,
  * governed (hash / scrub / mask per the pii_column_details config), stamped
  * with the full-row change hash `hashed_jk` and the merge bucket
  * `grouping_jk`, and epoch columns are cast to timestamps.
  *
  * Every step is a narrow per-row projection (no shuffle); the single
  * potential shuffle — the shard join — broadcasts the tiny mapping table.
  */
object CdcProcessor {

  /** Governance actions for matched PII columns. */
  sealed trait PiiAction
  case object HashComplete extends PiiAction   // sha2 into <col>_hash (original kept, as in the reference)
  case object ScrubPartial extends PiiAction   // free-text scrub into <col>_hash
  final case class Mask(pattern: String, replacement: String) extends PiiAction
  /** AES-encrypt the column in place (ref encryptIt fold,
    * M/processor/BaseProcessor.scala:79-81). */
  final case class Encrypt(codec: AesCodec) extends PiiAction

  final case class PiiRule(columnName: String, commonFlag: Boolean, action: PiiAction)

  /** Resolve + apply PII rules against the actual schema (ref identifyColumns
    * + the anonymize/encrypt folds at M/processor/BaseProcessor.scala:61-81). */
  def applyPiiRules(df: DataFrame, rules: Seq[PiiRule]): DataFrame =
    rules.foldLeft(df) { (d, rule) =>
      val cols = Pii.identifyColumns(d.columns.toSeq, Seq((rule.columnName, rule.commonFlag)))
      rule.action match {
        case HashComplete => Pii.hashColumns(d, cols)
        case ScrubPartial => Pii.scrubColumns(d, cols)
        case Mask(p, r) => cols.foldLeft(d)((dd, c) => Pii.mask(dd, c, p, r))
        case Encrypt(codec) => Crypto.encryptColumns(d, cols, codec)
      }
    }

  /** Build PII rules from a `pii_column_details`-shaped config frame
    * (pii_column_name, common_flag, anonymization_flag in
    * {complete, partial}, encryption_flag) — the reference's three
    * config-driven governance folds (M/processor/BaseProcessor.scala:70-81).
    * Bounded driver-side collect: this is a config table, rows = number of
    * governed columns. Encryption rules are emitted LAST, matching the
    * reference's hash -> scrub -> encrypt order. */
  def rulesFromPiiDetails(piiDf: DataFrame, codec: AesCodec): Seq[PiiRule] = {
    val rows = piiDf.select("pii_column_name", "common_flag",
      "anonymization_flag", "encryption_flag").collect()
    val anonymize = rows.toSeq.flatMap { r =>
      Option(r.getString(2)).map(_.toLowerCase) match {
        case Some("complete") => Some(PiiRule(r.getString(0), r.getBoolean(1), HashComplete))
        case Some("partial")  => Some(PiiRule(r.getString(0), r.getBoolean(1), ScrubPartial))
        case _ => None
      }
    }
    val encrypt = rows.toSeq.collect {
      case r if !r.isNullAt(3) && r.getBoolean(3) =>
        PiiRule(r.getString(0), r.getBoolean(1), Encrypt(codec))
    }
    anonymize ++ encrypt
  }

  /** Full processor: demux -> shard enrich -> omit -> govern -> change hash
    * -> merge bucket -> epoch cast. All config-driven, like the reference's
    * metadata-driven processor builders. */
  def process(envelope: DataFrame,
              shardMappings: Option[DataFrame] = None,
              omittedCols: Seq[String] = Nil,
              piiRules: Seq[PiiRule] = Nil,
              joinKeys: Seq[String] = Nil,
              groupingBuckets: Int = 500,
              epochMillisCols: Seq[String] = Nil): DataFrame = {
    // plain-table sources (sharded-JDBC bulk scan) arrive without the CDC
    // envelope: every row is an upsert
    val demuxed =
      if (CdcDemux.isEnvelope(envelope)) CdcDemux.demux(envelope)
      else {
        val d0 = if (envelope.columns.contains("row_active")) envelope
                 else envelope.withColumn("row_active", lit(true))
        if (d0.columns.contains("deleted_flag")) d0
        else d0.withColumn("deleted_flag", lit(false))
      }
    val sharded = shardMappings.map(CdcDemux.joinShards(demuxed, _)).getOrElse(demuxed)
    // fold-left drop, ref dropIt M/utility/Utility.scala:142-149
    val stripped = omittedCols.foldLeft(sharded)((d, c) => d.drop(c))
    val governed = applyPiiRules(stripped, piiRules)
    val dataCols = governed.columns.filterNot(
      Seq("row_active", "deleted_flag", "src_db", "src_server_id").contains)
    val withChangeHash = Pii.hashRow(governed, dataCols.toSeq)
    val withBucket =
      if (joinKeys.nonEmpty)
        withChangeHash.withColumn("grouping_jk",
          Hashes.groupingKey(joinKeys.map(col), groupingBuckets))
      else withChangeHash
    epochMillisCols.foldLeft(withBucket)((d, c) => Pii.epochMillisToTimestamp(d, c))
  }

  /** Join-keys-first column reorder (ref M/processor/BaseProcessor.scala:
    * 346-350: merge keys leading the projection). */
  def keysFirst(df: DataFrame, keys: Seq[String]): DataFrame = {
    val rest = df.columns.filterNot(keys.contains)
    df.select((keys ++ rest).map(col): _*)
  }

  /** CDC batch compaction: collapse each key's op sequence to its NET
    * effect before the merge — the standard pre-MERGE shrink that turns
    * "insert, update ×20, delete" into nothing and a hot key's churn into
    * one row. Net rules from (first op in batch, last op in batch):
    * c..d → `none` (born and died inside the batch), c..c/u → `c` with the
    * last payload, u/d..d → `d`, u/d..c/u → `u`. Applying the compacted
    * batch to the target equals applying the full sequence (ops are
    * last-writer-wins within a key), so the merge joins |keys| rows
    * instead of |ops|.
    *
    * One map-side-combined aggregation: first/last op and last payload are
    * min_by/max_by over the unique sequence column — no window, no sort of
    * the batch. */
  def compactNetEffect(df: DataFrame, keyCol: String, seqCol: String,
                       opCol: String, valueCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(min_by(col(opCol), col(seqCol)).as("first_op"),
        max_by(col(opCol), col(seqCol)).as("last_op"),
        max_by(col(valueCol), col(seqCol)).as("last_value"),
        count(lit(1)).cast("long").as("n_ops"))
      .withColumn("net_op",
        when(col("first_op") === "c" && col("last_op") === "d", lit("none"))
          .when(col("first_op") === "c", lit("c"))
          .when(col("last_op") === "d", lit("d"))
          .otherwise(lit("u")))
}
