package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join without a cross-join.
  *
  * Naive `points JOIN intervals ON key AND t BETWEEN s AND e` gives Catalyst
  * only the key as an equi-part; a hot key degenerates to an all-pairs
  * filter. Here both sides also join on a TIME CHUNK: each interval explodes
  * to the chunk ids it spans, each point maps to its own chunk, and the join
  * is fully equi on (key, chunk) — candidate pairs are bounded by
  * interval_length/chunk per interval, independent of key fan-in. The final
  * `BETWEEN` filter restores exact semantics.
  *
  * Choose `chunkSeconds` near the typical interval length: too small
  * replicates intervals across many chunks, too large re-creates the hot-key
  * problem inside a chunk.
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame, keys: Seq[String],
                      pointTs: String, startTs: String, endTs: String,
                      chunkSeconds: Long = 3600L): DataFrame = {
    val chunkUs = chunkSeconds * 1000000L
    def chunkOf(c: Column): Column = floor(unix_micros(c) / chunkUs)

    val p = points.withColumn("__chunk", chunkOf(col(pointTs)))
    val iv = intervals.withColumn("__chunk",
      explode(sequence(chunkOf(col(startTs)), chunkOf(col(endTs)))))

    p.join(iv, keys :+ "__chunk")
      .filter(col(pointTs) >= col(startTs) && col(pointTs) <= col(endTs))
      .drop("__chunk")
  }

  /** Interval × interval overlap join without a cross-join — the two-sided
    * generalization of [[pointInInterval]]. Both sides explode to the time
    * chunks they span and join fully equi on the chunk id; the overlap
    * predicate (aStart <= bEnd AND bStart <= aEnd) restores exact
    * semantics. A pair whose intervals span several common chunks would
    * match once per chunk, so each surviving pair is kept ONLY in the chunk
    * that owns `greatest(aStart, bStart)` — an O(1) ownership rule that
    * needs no post-join distinct (the dedup that usually makes binned
    * overlap joins shuffle twice). Candidate pairs per chunk are bounded by
    * the per-chunk interval density, independent of total row count; pick
    * `chunkSeconds` near the typical interval length, exactly as for
    * [[pointInInterval]]. Timestamp or date columns both work (dates cast
    * to midnight timestamps). */
  def intervalOverlap(a: DataFrame, b: DataFrame,
                      aStart: String, aEnd: String,
                      bStart: String, bEnd: String,
                      chunkSeconds: Long = 86400L): DataFrame = {
    val chunkUs = chunkSeconds * 1000000L
    def chunkOf(c: Column): Column =
      floor(unix_micros(c.cast("timestamp")) / chunkUs)

    val ae = a.withColumn("__chunk",
      explode(sequence(chunkOf(col(aStart)), chunkOf(col(aEnd)))))
    val be = b.withColumn("__chunk",
      explode(sequence(chunkOf(col(bStart)), chunkOf(col(bEnd)))))
    // pinned-width repartition on the join key (r18): the per-chunk join
    // fan-out is invisible to AQE (it sizes partitions from the small
    // pre-join bytes and coalesced the q136 gate's join onto 3 tasks
    // while the chunk-pair compute dominated the query); an explicit
    // count defeats the coalesce and the join reuses the exchanges, so
    // none is added (guide §2.5 — width derived from cores, never a
    // constant)
    val n = a.sparkSession.sparkContext.defaultParallelism
    ae.repartition(n, col("__chunk"))
      .join(be.repartition(n, col("__chunk")), Seq("__chunk"))
      .filter(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd))
      .filter(col("__chunk") === chunkOf(greatest(col(aStart), col(bStart))))
      .drop("__chunk")
  }
}
