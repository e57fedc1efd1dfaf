package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.merge.MergeInto.{InsertAll, UpdateAll, WhenMatched, WhenNotMatched}
import graft.merge.ParquetTable
import graft.operators.{Dedup, Sampling}

/** Grand end-to-end: the reference-shaped metadata-driven ingestion
  * (control row -> reader -> processor -> SCD1 merge -> journal) feeding the
  * training-data curation operators (exact dedup -> temperature rebalance ->
  * deterministic shard export) over the SAME table — the "a user of the
  * reference switches to this library and runs their whole flow" scenario.
  */
class CurationE2ESpec extends SparkSpec {

  private def envelope(df: org.apache.spark.sql.DataFrame) = {
    val payload = struct(col("doc_id"), col("text"), col("lang"),
      col("source"), col("n_chars"))
    df.select(struct(
      lit("c").as("op"),
      payload.as("before"),
      payload.as("after"),
      struct(lit("db0").as("db"), lit(1L).as("server_id")).as("source")).as("value"))
  }

  test("ingest -> SCD1 merge -> dedup -> rebalance -> sharded export") {
    val root = tmpDir("curation_e2e")
    val journal = new Journal(spark, tmpDir("curation_journal"))
    val cfg = TableConfig("pdc", "docs", "scd1", Seq("doc_id"), Nil, Nil, Nil,
      "updated_at", None, Seq(WhenMatched(None, UpdateAll)),
      Seq(WhenNotMatched(None, InsertAll)), None, None)

    // corpus batch: 200 docs + 20 re-crawled EXACT duplicates under new ids
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id") < 200)
    val dups = docs.filter(col("doc_id") < 20)
      .withColumn("doc_id", col("doc_id") + 100000L)
    val batch = envelope(docs.unionByName(dups))

    val ok = IngestionJob.run(spark, Seq(cfg), _ => () => batch, root,
      journal = Some(journal))
    assert(ok.values.forall(identity))
    assert(journal.failedPipelines.isEmpty)
    assert(journal.facts.read.count() == 1) // one batch journaled

    val ingested = new ParquetTable(spark, s"$root/docs", Nil).read
    assert(ingested.count() == 220) // all keys distinct -> all merged in

    // curation stage 1: exact dedup collapses the 20 re-crawled copies
    val survivors = Dedup.exactSurvivors(ingested, "text", "doc_id")
      .localCheckpoint()
    assert(survivors.count() == 200)
    // survivorship keeps the SMALLEST id -> originals win over re-crawls
    assert(survivors.filter(col("doc_id") >= 100000L).count() == 0)

    // curation stage 2: temperature rebalance accounting over the survivors
    val mix = Sampling.temperatureMix(survivors, "source", "doc_id",
      alpha = 0.5, targetRows = 100)
    val mixRows = mix.collect()
    assert(mixRows.map(_.getLong(1)).sum == 200) // accounts for every survivor
    assert(mixRows.forall(r => r.getLong(3) <= r.getLong(1))) // kept <= docs

    // curation stage 3: deterministic shard export manifest over survivors
    val manifest = Sampling.shardManifest(survivors, "doc_id", 8)
    val m = manifest.collect()
    assert(m.map(_.getLong(1)).sum == 200) // every survivor lands in a shard
    assert(m.length <= 8 && m.map(_.getLong(0)).distinct.length == m.length)
  }
}
