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
}
