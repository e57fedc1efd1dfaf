package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.merge.MergeInto.{WhenMatched, WhenNotMatched}
import graft.operators.CdcProcessor
import graft.sources.Sources

/** Fluent builder facade over the functional pipeline core — the reference's
  * builder API shape (ref M/Pipeline/PipelineBuilder.scala:12-185,
  * M/reader/ReaderBuilder.scala:6-43, M/processor/ProcessorBuilder.scala)
  * re-expressed over [[Pipeline]]/[[IngestionJob]]/[[graft.operators.CdcProcessor]].
  * Every builder method mutates-and-returns `this` exactly like the
  * reference; `build()` hands back the same [[Pipeline]] the functional API
  * constructs, and the writer task delegates to [[IngestionJob.writeBatch]],
  * so facade-built pipelines are behavior-identical to
  * [[IngestionJob.buildPipeline]] ones by construction.
  */
final case class MergeScd1Options(
    joinKeys: Seq[String],
    matched: Seq[WhenMatched] = Nil,
    notMatched: Seq[WhenNotMatched] = Nil,
    dedupOrderCols: Seq[String] = Nil,
    extraCondition: Option[String] = None,
    partitionKeys: Seq[String] = Nil)

/** SCD2 staged-union merge options (ref mergeSCD2Options,
  * M/writter/BaseWritter.scala:27-30). */
final case class MergeScd2Options(
    joinKeys: Seq[String],
    matchCondition: String,
    updateMap: Map[String, String],
    insertMap: Map[String, String],
    dedupOrderCols: Seq[String] = Nil,
    extraCondition: Option[String] = None,
    partitionKeys: Seq[String] = Nil)

/** SCD4 current+history options (ref mergeSCD4Options,
  * M/writter/BaseWritter.scala:31-34). */
final case class MergeScd4Options(
    joinKeys: Seq[String],
    updatedAtCol: String,
    dedupOrderCols: Seq[String] = Nil,
    extraCondition: Option[String] = None,
    partitionKeys: Seq[String] = Nil)

/** Reader factory (ref M/reader/ReaderBuilder.scala:6-43). Returns LAZY
  * readers (`() => DataFrame`) — the reference also just news up reader
  * objects whose read happens later inside the task. */
final class ReaderBuilder(spark: SparkSession) {
  def getCsvReader(path: String, ddlSchema: String,
                   header: Boolean = false): () => DataFrame =
    () => Sources.csv(spark, path, ddlSchema, header)

  def getParquetReader(path: String, options: Map[String, String] = Map.empty,
                       readLimit: Int = 0): () => DataFrame =
    () => Sources.parquet(spark, path, options, readLimit)

  def getSqlJdbcReader(url: String, table: String,
                       options: Map[String, String] = Map.empty,
                       readLimit: Int = 1000): () => DataFrame =
    () => Sources.jdbc(spark, url, table, options, readLimit)

  def getHttpReader(firstUrl: String, fetch: String => String,
                    maxPages: Int = 100,
                    pageSink: DataFrame => Unit = _ => ()): () => DataFrame =
    () => Sources.httpJson(spark, firstUrl, fetch, maxPages, pageSink)

  /** The reference's KafkaReader niche: a streaming CDC-envelope source. */
  def getCdcStreamReader(dir: String, payload: StructType,
                         maxFilesPerTrigger: Int = 20): () => DataFrame =
    () => Sources.cdcFileStream(spark, dir, payload, maxFilesPerTrigger)

  /** The reference's DeltaStreamReader niche: a throttled table stream. */
  def getTableStreamReader(path: String, schema: StructType,
                           maxFilesPerTrigger: Int = 20): () => DataFrame =
    () => Sources.tableStream(spark, path, schema, maxFilesPerTrigger)
}

object ReaderBuilder {
  def start(spark: SparkSession): ReaderBuilder = new ReaderBuilder(spark)
}

/** Processor configuration builder (ref M/processor/ProcessorBuilder.scala):
  * accumulates the CDC-processor knobs, `build()` returns the transform. */
final class ProcessorBuilder {
  private var shardMappings: Option[DataFrame] = None
  private var omittedCols: Seq[String] = Nil
  private var piiRules: Seq[CdcProcessor.PiiRule] = Nil
  private var joinKeys: Seq[String] = Nil
  private var groupingBuckets: Int = 500
  private var epochMillisCols: Seq[String] = Nil

  def setShardMappings(df: DataFrame): ProcessorBuilder = { shardMappings = Some(df); this }
  def setOmittedCols(cols: Seq[String]): ProcessorBuilder = { omittedCols = cols; this }
  def setPiiRules(rules: Seq[CdcProcessor.PiiRule]): ProcessorBuilder = { piiRules = rules; this }
  def setJoinKeys(keys: Seq[String]): ProcessorBuilder = { joinKeys = keys; this }
  def setGroupingBuckets(n: Int): ProcessorBuilder = { groupingBuckets = n; this }
  def setEpochMillisCols(cols: Seq[String]): ProcessorBuilder = { epochMillisCols = cols; this }

  def build(): DataFrame => DataFrame =
    df => CdcProcessor.process(df, shardMappings, omittedCols, piiRules,
      graft.merge.MergeInto.extractJoinKeys(joinKeys), groupingBuckets, epochMillisCols)
}

object ProcessorBuilder {
  def start(): ProcessorBuilder = new ProcessorBuilder()
}

/** Fluent pipeline assembly (ref M/Pipeline/PipelineBuilder.scala:12-185):
  * `start(...).set*(...).addReader(...).addProcessor(...).addWriter(...)
  * .build().run()`. Generic `addTask`/`addAfter` admit arbitrary DAG nodes;
  * the reader/processor/writer conveniences reproduce the reference's
  * 3-node CDC shape. */
final class PipelineBuilder private (spark: SparkSession) {
  private var pName: String = ""
  private var runId: String = ""
  private var batchId: String = ""
  private var productName: String = ""
  private var topicName: String = ""
  private var pipelineDefId: String = ""
  private var tableName: String = ""
  private var scd1: Option[MergeScd1Options] = None
  private var scd2: Option[MergeScd2Options] = None
  private var scd4: Option[MergeScd4Options] = None
  private var journal: Option[Journal] = None
  // (key, parent, taskFn) in insertion order; parent "" = root
  private val nodes =
    scala.collection.mutable.ListBuffer[(String, String, (SparkSession, Map[String, DataFrame]) => Map[String, DataFrame])]()

  def setPipelineName(n: String): PipelineBuilder = { pName = n; this }
  def setRunId(id: String): PipelineBuilder = { runId = id; this }
  def setBatchId(id: String): PipelineBuilder = { batchId = id; this }
  def setProductName(n: String): PipelineBuilder = { productName = n; this }
  def setTopicName(n: String): PipelineBuilder = { topicName = n; this }
  def setPipelineDefId(id: String): PipelineBuilder = { pipelineDefId = id; this }
  def setTableName(n: String): PipelineBuilder = { tableName = n; this }
  def setJournal(j: Journal): PipelineBuilder = { journal = Some(j); this }

  def setMergeSCD1Options(o: MergeScd1Options): PipelineBuilder = { scd1 = Some(o); this }
  def setMergeSCD2Options(o: MergeScd2Options): PipelineBuilder = { scd2 = Some(o); this }
  def setMergeSCD4Options(o: MergeScd4Options): PipelineBuilder = { scd4 = Some(o); this }

  def addTask(key: String)(
      fn: (SparkSession, Map[String, DataFrame]) => Map[String, DataFrame]): PipelineBuilder = {
    nodes += ((key, "", fn)); this
  }

  def addAfter(afterNodeKey: String, key: String)(
      fn: (SparkSession, Map[String, DataFrame]) => Map[String, DataFrame]): PipelineBuilder = {
    nodes += ((key, afterNodeKey, fn)); this
  }

  /** Root reader node emitting the `rawdf` channel (ref Task.rawdf). */
  def addReader(key: String, reader: () => DataFrame): PipelineBuilder =
    addTask(key)((_, _) => Map("rawdf" -> reader()))

  /** Processor node: `rawdf` in, `processedDf` out (ref Task.processedDf). */
  def addProcessor(afterNodeKey: String, key: String,
                   proc: DataFrame => DataFrame): PipelineBuilder =
    addAfter(afterNodeKey, key)((_, in) => Map("processedDf" -> proc(in("rawdf"))))

  /** Writer node merging `processedDf` into `targetRoot/<tableName>` by
    * whichever mergeSCD*Options was set — the exact
    * [[IngestionJob.writeBatch]] path the functional API uses. */
  def addWriter(afterNodeKey: String, key: String, targetRoot: String): PipelineBuilder =
    addAfter(afterNodeKey, key) { (s, in) =>
      Map("written" -> IngestionJob.writeBatch(s, toConfig, targetRoot,
        in("processedDf"), journal))
    }

  /** The merge options re-expressed as the metadata row the functional core
    * consumes; exactly one setMergeSCD*Options must have been called before
    * the writer runs. */
  private def toConfig: TableConfig = {
    require(Seq(scd1, scd2, scd4).count(_.isDefined) == 1,
      "exactly one of setMergeSCD{1,2,4}Options must be set before the writer runs")
    val base = TableConfig(
      pipelineDefId = pipelineDefId, tableName = tableName, scdType = "scd1",
      joinKeys = Nil, partitionKeys = Nil, dedupKeys = Nil, omittedCols = Nil,
      updatedAtCol = "updated_at", extraJoinCond = None,
      matched = Nil, notMatched = Nil, scd2Spec = None, writeConfig = None)
    (scd1, scd2, scd4) match {
      case (Some(o), _, _) => base.copy(scdType = "scd1", joinKeys = o.joinKeys,
        partitionKeys = o.partitionKeys, dedupKeys = o.dedupOrderCols,
        extraJoinCond = o.extraCondition,
        matched = if (o.matched.isEmpty) Seq(WhenMatched(None, graft.merge.MergeInto.UpdateAll)) else o.matched,
        notMatched = if (o.notMatched.isEmpty) Seq(WhenNotMatched(None, graft.merge.MergeInto.InsertAll)) else o.notMatched)
      case (_, Some(o), _) => base.copy(scdType = "scd2", joinKeys = o.joinKeys,
        partitionKeys = o.partitionKeys, dedupKeys = o.dedupOrderCols,
        extraJoinCond = o.extraCondition,
        scd2Spec = Some((o.matchCondition, o.updateMap, o.insertMap)))
      case (_, _, Some(o)) => base.copy(scdType = "scd4", joinKeys = o.joinKeys,
        partitionKeys = o.partitionKeys, dedupKeys = o.dedupOrderCols,
        extraJoinCond = o.extraCondition, updatedAtCol = o.updatedAtCol)
      case _ => base // unreachable (require above)
    }
  }

  /** Assemble the [[Pipeline]]. Name defaults to the reference's composite
    * `<pipelineDefId>_<tableName>` when setPipelineName was not called. */
  def build(): Pipeline = {
    val p = new Pipeline(
      if (pName.nonEmpty) pName else s"${pipelineDefId}_$tableName", spark)
    nodes.foreach { case (key, parent, fn) =>
      val t = new Task {
        val name = key
        def run(s: SparkSession, in: Map[String, DataFrame]): Map[String, DataFrame] = fn(s, in)
      }
      if (parent.isEmpty) p.addTask(t) else p.addAfter(parent, t)
    }
    p
  }
}

object PipelineBuilder {
  def start(spark: SparkSession): PipelineBuilder = new PipelineBuilder(spark)
}
