package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Debezium-envelope CDC handling (reference consumes this shape at
  * M/processor/BaseProcessor.scala:40-49): events arrive as
  * `value{op, before, after, source{db, server_id}}` with `op in {c,u,d}`.
  * The demux splits upserts from deletes, tags `row_active`/`deleted_flag`,
  * expands `value.after.*`, and unions the two legs back — all narrow
  * (per-row) ops, no shuffle.
  */
object CdcDemux {

  /** Envelope schema for a given payload (the `after`/`before` row type). */
  def envelopeSchema(payload: StructType): StructType = StructType(Seq(
    StructField("value", StructType(Seq(
      StructField("op", StringType),
      StructField("before", payload),
      StructField("after", payload),
      StructField("source", StructType(Seq(
        StructField("db", StringType),
        StructField("server_id", LongType)))))))))

  /** True when the frame carries the Debezium envelope (a `value` struct
    * with an `op` field) — plain-table sources (JDBC bulk scans, history
    * loads) skip the demux. */
  def isEnvelope(df: DataFrame): Boolean =
    df.schema.fields.find(_.name == "value").exists(_.dataType match {
      case s: StructType => s.fieldNames.contains("op")
      case _ => false
    })

  /** Demux a raw envelope frame into flattened rows with `row_active` /
    * `deleted_flag` (ref M/processor/BaseProcessor.scala:40-49): upserts
    * (op c/u) expand `after`, deletes (op d) expand `before` with
    * `row_active=false, deleted_flag=true`. */
  def demux(raw: DataFrame): DataFrame = {
    val upserts = raw.filter(col("value.op").isin("c", "u"))
      .withColumn("row_active", lit(true))
      .withColumn("deleted_flag", lit(false))
      .selectExpr("value.after.*", "row_active", "deleted_flag",
        "value.source.db as src_db", "value.source.server_id as src_server_id")
    val deletes = raw.filter(col("value.op") === "d")
      .withColumn("row_active", lit(false))
      .withColumn("deleted_flag", lit(true))
      .selectExpr("value.before.*", "row_active", "deleted_flag",
        "value.source.db as src_db", "value.source.server_id as src_server_id")
    upserts.union(deletes)
  }

  /** Enrich demuxed CDC rows with their shard via an inner equi-join on the
    * 2-column key (db, server_id) (ref M/processor/BaseProcessor.scala:52-56).
    * The shard-mapping dim is tiny -> broadcast, so this never shuffles the
    * stream side. */
  def joinShards(cdc: DataFrame, shardMappings: DataFrame): DataFrame =
    cdc.join(broadcast(shardMappings),
      cdc("src_db") === shardMappings("db") &&
        cdc("src_server_id") === shardMappings("server_id"),
      "inner").drop("db", "server_id")
}
