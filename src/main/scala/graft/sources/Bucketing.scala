package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed catalog tables: the co-located-join lever for repeated merges.
  *
  * A CDC merge joins target and updates on the same keys every batch; if
  * both sides are bucketed (and sorted) by those keys into the same bucket
  * count, the join needs NO shuffle — each task reads matching buckets from
  * both tables. At 100 TB that removes the dominant cost of every
  * incremental merge. Spark only honors bucketing through the catalog
  * (`saveAsTable`), not path-based parquet, hence this thin wrapper.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted catalog table (overwrite). Pass `path`
    * to place the files outside the warehouse dir (external table). */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    numBuckets: Int, path: Option[String] = None): Unit = {
    val w = df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
    path.foreach(p => w.option("path", p))
    w.saveAsTable(table)
  }

  /** Join two co-bucketed tables on their bucket keys — shuffle-free when
    * bucket specs match (verify with .explain: no Exchange above the scans). */
  def cobucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                     keys: Seq[String], joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys, joinType)
}
