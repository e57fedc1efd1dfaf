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
    // events.ts has shifted physical type across testdata generations:
    // TIMESTAMP(NANOS) (vectorized reader rejects it — read as long via the
    // legacy conf and truncate to micros, the same truncation DuckDB
    // applies) and TIMESTAMP(MICROS) with isAdjustedToUTC=false (Spark maps
    // it to TIMESTAMP_NTZ, which time arithmetic like unix_micros rejects —
    // cast to session-TZ TIMESTAMP; the session is pinned to UTC, so the
    // wall-clock values are unchanged and DuckDB's naive-timestamp oracle
    // agrees). Normalizing here keeps every downstream operator on one type.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(types.LongType) =>
        df.withColumn("ts", functions.expr("timestamp_micros(ts div 1000)"))
      case Some(types.TimestampNTZType) =>
        df.withColumn("ts", functions.col("ts").cast(types.TimestampType))
      case _ => df
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
