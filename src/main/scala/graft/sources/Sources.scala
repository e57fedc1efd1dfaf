package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.operators.CdcDemux

/** Batch + streaming sources, re-expressing the reference's reader layer
  * (reference M/reader/Readers.scala, M/reader/HttpReader.scala) on the
  * connectors available in a plain Spark distribution.
  */
object Sources {

  /** Batch JDBC scan with the reference's row cap
    * (ref M/reader/Readers.scala:15-41 caps at 1000). `readLimit <= 0`
    * disables the cap. */
  def jdbc(spark: SparkSession, url: String, table: String,
           options: Map[String, String] = Map.empty,
           readLimit: Int = 1000): DataFrame = {
    val df = spark.read.format("jdbc")
      .options(options)
      .option("url", url)
      .option("dbtable", table)
      .load()
    if (readLimit > 0) df.limit(readLimit) else df
  }

  /** Batch parquet scan (ref M/reader/Readers.scala:43-68). */
  def parquet(spark: SparkSession, path: String,
              options: Map[String, String] = Map.empty,
              readLimit: Int = 0): DataFrame = {
    val df = spark.read.options(options).parquet(path)
    if (readLimit > 0) df.limit(readLimit) else df
  }

  /** Real CSV reader (the reference's CSVReaders is a misnamed stub; its
    * tests read CSVs with explicit DDL schemas everywhere, e.g.
    * T/writter/DeltaWritterTest.scala:32). */
  def csv(spark: SparkSession, path: String, ddlSchema: String,
          header: Boolean = false): DataFrame =
    spark.read.option("header", header.toString).schema(ddlSchema).csv(path)

  /** CSV-append page sink for [[httpJson]], mirroring the reference's
    * append-per-page spill (ref M/reader/HttpReader.scala:57,60): each
    * fetched page lands on disk before the next fetch, so a very long
    * pagination never has to survive whole in driver/executor memory. */
  def csvPageSink(path: String): DataFrame => Unit =
    df => df.write.mode("append").option("header", "false").csv(path)

  /** Paginated JSON API -> DataFrame (ref M/reader/HttpReader.scala:8-64):
    * fetch page, parse with spark.read.json, explode `data[]`, project the
    * nested attributes, follow `links.next` until exhausted. The transport is
    * pluggable (`fetch`) so tests inject pages and production plugs any HTTP
    * client; pagination stays driver-side exactly like the reference.
    * `pageSink` (e.g. [[csvPageSink]]) is invoked once per fetched page, in
    * page order, before the next page is fetched. */
  def httpJson(spark: SparkSession, firstUrl: String, fetch: String => String,
               maxPages: Int = 100,
               pageSink: DataFrame => Unit = _ => ()): DataFrame = {
    import spark.implicits._
    var url = Option(firstUrl)
    var pages = 0
    var acc: Option[DataFrame] = None
    while (url.isDefined && pages < maxPages) {
      val body = fetch(url.get)
      val page = spark.read.json(Seq(body).toDS)
      val rows = page.select(explode(col("data")).as("explodedData"))
        .select(col("explodedData.id").as("id"), col("explodedData.attributes.*"))
      pageSink(rows)
      acc = acc.map(_.unionByName(rows, allowMissingColumns = true)).orElse(Some(rows))
      url = {
        // last pages commonly return {"links": {}} or drop "next" entirely —
        // treat any shape without a string links.next as end-of-pagination
        val hasNext = page.schema.fields.find(_.name == "links").map(_.dataType) match {
          case Some(st: org.apache.spark.sql.types.StructType) => st.fieldNames.contains("next")
          case _ => false
        }
        if (hasNext)
          Option(page.select(col("links.next").cast("string")).collect().head.getString(0))
        else None
      }
      pages += 1
    }
    acc.getOrElse(spark.emptyDataFrame)
  }

  /** Streaming CDC source: Debezium-envelope JSON files in a directory stand
    * in for the reference's Kafka+Avro stream (ref M/reader/Readers.scala:
    * 108-152 — no kafka/avro connectors in this environment). Back-pressure
    * via maxFilesPerTrigger mirrors maxOffsetsPerTrigger. */
  def cdcFileStream(spark: SparkSession, dir: String, payload: StructType,
                    maxFilesPerTrigger: Int = 20): DataFrame =
    spark.readStream
      .schema(CdcDemux.envelopeSchema(payload))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dir)

  /** Throttled streaming scan of a table directory (ref DeltaStreamReader,
    * M/reader/Readers.scala:179-211, with its per-table file throttle map). */
  def tableStream(spark: SparkSession, path: String, schema: StructType,
                  maxFilesPerTrigger: Int = 20): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(path)
}

/** Manual offset bookkeeping for resumable ingestion, re-implementing the
  * reference's status-table offset resume (ref M/utility/Utility.scala:
  * 226-249: max endOffset per (topic, partition) -> startingOffsets JSON;
  * "earliest" = -2 when a partition has no history).
  */
object OffsetTracker {

  /** Build the startingOffsets JSON for `topic` from a status frame with
    * columns (topic, partition, endOffset). */
  def startingOffsets(status: DataFrame, topic: String, numPartitions: Int): String = {
    val maxed = status.filter(col("topic") === topic)
      .groupBy(col("partition"))
      .agg(max(col("endOffset")).as("o"))
      .collect()
      .map(r => r.getAs[Any]("partition").toString.toInt -> r.getAs[Long]("o"))
      .toMap
    val parts = (0 until numPartitions)
      .map(p => s""""$p": ${maxed.getOrElse(p, -2L)}""")
      .mkString(", ")
    s"""{"$topic": {$parts}}"""
  }

  /** Offset-range facts per (topic, partition) for journaling
    * (ref M/commons/Task.scala:99-100). */
  def offsetRanges(df: DataFrame): DataFrame =
    df.groupBy(col("topic"), col("partition"))
      .agg(min(col("offset")).cast("long").as("startOffset"),
        max(col("offset")).cast("long").as("endOffset"))
}
