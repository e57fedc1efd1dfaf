package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement probe from the r18 optimization round (builder-side tool,
  * never invoked by the driver harness): candidate-set partition counts
  * and row counts at the prefix-filter verify joins — the numbers behind
  * OPTIMIZATION_r18.md's finding that the r17 `widen(cands)` is a no-op
  * on q193 (32 partitions already) and real on q211 (4 partitions). */
object ProbeR18 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, sfDir, "documents")

    // q193 shape
    val toks = graft.operators.Dedup.prefixTokenSets(docs, "text", "doc_id", 3)
    val prefix = graft.operators.Dedup.prefixPostings(toks, 0.5)
    val cands = graft.operators.Dedup.prefixCandidatesFrom(prefix).localCheckpoint()
    println(s"q193 cands: parts=${cands.rdd.getNumPartitions} rows=${cands.count()}")
    prefix.unpersist(blocking = true)

    // q211 shape
    val st = graft.operators.Dedup.containmentStages(
      graft.operators.Dedup.prefixTokenSets(docs, "text", "doc_id", 3), 0.7)
    val c2 = graft.operators.Dedup.containmentCandidatesFrom(st.prefix, st.posts)
      .localCheckpoint()
    println(s"q211 cands: parts=${c2.rdd.getNumPartitions} rows=${c2.count()}")
    st.release()
    spark.stop()
  }
}
