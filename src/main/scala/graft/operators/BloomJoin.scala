package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Bloom-prefiltered semi join: Spark's runtime-filter pattern
  * (`InjectRuntimeFilter`) made explicit and manually steerable.
  *
  * A semi join of a huge fact table against a filtered dimension normally
  * shuffles EVERY fact row to the join. Building a Bloom filter over the
  * dimension keys and applying it as a scan-side predicate drops the
  * (typically vast) majority of non-matching fact rows BEFORE the shuffle —
  * the filter has no false negatives, so the exact semi join afterwards
  * returns precisely the same rows and merely sees less input. Spark's AQE
  * injects this automatically in some plans; the explicit operator covers
  * the cases it can't see (a key set produced outside the query, a reused
  * filter across several queries, a stream prefiltered against a static
  * dim).
  *
  * The filter is built with `DataFrameStatFunctions.bloomFilter` (one
  * aggregation over the dim side) and evaluated by Spark's own codegen'd
  * [[BloomFilterMightContain]] expression, so the probe stays inside the
  * scan's whole-stage-codegen loop. The serialized filter is
  * driver-collected: `fpp`-sized for the expected key count (1M keys at 1%
  * ~ 1.2 MB) — control-plane bounded, and at cluster scale it ships to
  * executors once as a task-binary constant exactly like a broadcast.
  */
object BloomJoin {

  /** The `might_contain(filterBytes, key)` predicate as a Column. The
    * expression constructor is not reachable from the public Column API in
    * Spark 4, so it goes through the session registry under a
    * content-addressed name (same pattern as
    * [[graft.functions.VectorFunctions.nearestCentroid]]). */
  private def mightContain(spark: org.apache.spark.sql.SparkSession,
                           filterBytes: Array[Byte], key: Column): Column = {
    // content-address by a FULL md5 of the serialized filter: Registry.ensure
    // is first-wins, so a truncated (32-bit) name could silently bind a later
    // join to an earlier filter's bytes on collision — md5 makes distinct
    // filters unable to share a name
    val md5hex = java.security.MessageDigest.getInstance("MD5")
      .digest(filterBytes).map("%02x".format(_)).mkString
    val name = "graft_bloom_might_contain_" + md5hex
    graft.functions.Registry.ensure(spark, name)(
      exprs => BloomFilterMightContain(
        Literal.create(filterBytes, BinaryType), exprs(0)))
    call_function(name, key)
  }

  /** `large LEFT SEMI JOIN small ON large(largeKey) = small(smallKey)`, with
    * a Bloom prefilter on the large side's scan. Result rows are EXACTLY the
    * plain semi join's (no false negatives); `expectedItems`/`fpp` only tune
    * how much of the large side survives to the shuffle. Keys must be
    * integral (probed as longs). */
  def bloomSemiJoin(large: DataFrame, small: DataFrame,
                    largeKey: String, smallKey: String,
                    expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val spark = large.sparkSession
    // null keys never equi-match; dropping them also keeps the bloom build
    // total (stat.bloomFilter puts every row) from tripping on nulls
    val bf = small.select(col(smallKey).cast("long").as("k"))
      .filter(col("k").isNotNull)
      .stat.bloomFilter("k", expectedItems, fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    val prefiltered = large.filter(
      mightContain(spark, bos.toByteArray, col(largeKey).cast("long")))
    // no distinct on the build side: semi-join semantics already ignore
    // duplicate keys, a distinct would just add a shuffle
    prefiltered.join(small.select(col(smallKey).as(largeKey)),
      Seq(largeKey), "left_semi")
  }
}
