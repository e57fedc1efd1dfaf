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

  /** Morton/Z-order value: interleave the low `bits` bits of two
    * NON-NEGATIVE integer columns (a in the even positions, b in the odd) —
    * the space-filling-curve sort key behind multi-dimensional data
    * CLUSTERING in lakehouse layouts. Files written in z-value order are
    * simultaneously clustered on BOTH dimensions, so min/max file statistics
    * prune scans for predicates on either column — a single-column sort
    * clusters one dimension and randomizes the other. Pure unrolled integer
    * bit arithmetic: codegen'd, engine-portable, no UDF. Quantize wide
    * domains to `bits` bits first (equal-width or via
    * [[graft.operators.Stats.histogramBuckets]] for equal-frequency). */
  def zOrderValue(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
                  bits: Int): org.apache.spark.sql.Column = {
    require(bits >= 1 && bits <= 31, "bits in [1, 31]")
    import org.apache.spark.sql.functions._
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc +
        shiftright(a.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(b.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }
  }
}
