package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-at-or-before) join — the time-series enrichment
  * operator Spark lacks natively.
  *
  * For every left row, attach the right row with the LARGEST `rightTs <=
  * leftTs` within the same key group (e.g. each event gets the latest prior
  * quote/config/model-version).
  *
  * Implementation composes built-ins (preference (a) of the custom-operator
  * ladder): tag both sides, UNION, and take a running `last(_, ignoreNulls)`
  * over a (key)-partitioned window ordered by (ts, side). That is ONE
  * shuffle on the key — never a range cross-join, whose candidate set
  * explodes quadratically at 100 TB. Right rows sort BEFORE left rows at
  * equal timestamps, so `rightTs == leftTs` matches (inclusive as-of,
  * DuckDB/`ASOF JOIN` semantics).
  *
  * Caller contract: right side should be unique per (keys, rightTs) —
  * pre-aggregate otherwise (ties would be broken arbitrarily).
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String,
           rightCols: Seq[String]): DataFrame = {
    val side = "__graft_side"
    val ts = "__graft_ts"
    val payload = "__graft_payload"
    val leftCols = left.columns.toSeq

    // The whole right payload travels as ONE struct: a right row whose
    // payload COLUMN is genuinely NULL still has a non-null struct, so
    // last(_, ignoreNulls) attributes it correctly instead of skipping to an
    // older row ("no prior row" and "prior row with NULL value" differ).
    val l = left
      .withColumn(ts, col(leftTs))
      .withColumn(side, lit(1))
      .withColumn(payload,
        lit(null).cast(org.apache.spark.sql.types.StructType(
          rightCols.map(c => org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)))))
    val r0 = right.select((keys.map(col) :+ col(rightTs).as(ts)) :+
      struct(rightCols.map(col): _*).as(payload): _*)
      .withColumn(side, lit(0))

    val rAligned = leftCols.filterNot(c => keys.contains(c)).foldLeft(r0)((d, c) =>
      d.withColumn(c, lit(null).cast(left.schema(c).dataType)))

    val unioned = l.unionByName(rAligned.select(l.columns.map(col): _*))

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, col(side).asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = unioned.withColumn(payload,
      last(col(payload), ignoreNulls = true).over(w))

    filled.filter(col(side) === 1)
      .select(leftCols.map(col) ++
        rightCols.map(c => col(s"$payload.$c").as(c)): _*)
  }
}
