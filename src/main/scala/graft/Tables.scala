package graft

import org.apache.spark.sql.{functions, types, DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish parquet tables (TESTDATA.md).
  *
  * Each table is a single parquet file per scale factor; at cluster scale these
  * would be directories of many files — `spark.read.parquet` handles both, and
  * every query below relies on Catalyst pushing filters/projections into the
  * scan (verified via `.explain` in the specs).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    // rejects; read it as a long (legacy conf) and truncate to micros — the
    // same truncation DuckDB applies, so the oracle agrees.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.fields.find(f => f.name == "ts" && f.dataType == types.LongType) match {
      case Some(_) =>
        df.withColumn("ts", functions.expr("timestamp_micros(ts div 1000)"))
      case None => df
    }
  }

  /** Register all tables as temp views (for spark.sql-based entry points). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))

  /** Spread a narrow input across the cluster before CPU-bound per-row work.
    * A small parquet table arrives as 1-2 partitions (one file < split size);
    * any expensive scalar stage (hashing, shingling, UDF decode) would then
    * run on one core. At real scale inputs already have >= defaultParallelism
    * partitions and this is a no-op — no extra shuffle on the 100 TB path. */
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
