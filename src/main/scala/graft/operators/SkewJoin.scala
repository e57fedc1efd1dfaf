package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * A plain shuffle join sends every row of a hot key to ONE reducer; at
  * 100 TB a single mega-key stalls the stage. Salting splits each left-side
  * key into `saltFactor` sub-partitions (deterministic salt derived from
  * non-key columns, so the result is reproducible) and replicates each
  * right-side row `saltFactor` times, joining on (key, salt). Reducer
  * parallelism for a hot key rises from 1 to saltFactor at the cost of
  * duplicating the (smaller) right side.
  *
  * AQE's skew-join split covers sort-merge joins automatically; explicit
  * salting remains the tool for aggregations-after-join and for engines of
  * record where the plan must be deterministic.
  */
object SkewJoin {

  /** Inner equi-join of `big` (skewed) with `small` on `keys`. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltFactor: Int = 8): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val saltCol = "__graft_salt"
    // deterministic salt: portable hash of the whole row spread over factor
    val allCols = big.columns.map(col)
    val salted = big.withColumn(saltCol,
      pmod(graft.functions.Hashes.portableHash32(concat_ws("",
        allCols.map(_.cast("string")): _*)), lit(saltFactor.toLong)))
    val replicated = small.withColumn(saltCol,
      explode(sequence(lit(0L), lit(saltFactor.toLong - 1))))
    salted.join(replicated, keys :+ saltCol).drop(saltCol)
  }
}
