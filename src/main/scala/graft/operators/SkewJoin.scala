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

  /** Inner equi-join of `big` (skewed) with `small` on `keys`.
    *
    * The salt must VARY within a hot key to split it across reducers, so it
    * hashes the key plus the first couple of non-key columns. `xxhash64`
    * over native column values stays inside whole-stage codegen (no per-row
    * stringification of the full row) and is deterministic across runs. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltFactor: Int = 8): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val saltCol = "__graft_salt"
    val spread = big.columns.filterNot(keys.contains).take(2)
    val salted = big.withColumn(saltCol,
      pmod(xxhash64((keys ++ spread).map(col): _*), lit(saltFactor.toLong)))
    val replicated = small.withColumn(saltCol,
      explode(sequence(lit(0L), lit(saltFactor.toLong - 1))))
    salted.join(replicated, keys :+ saltCol).drop(saltCol)
  }
}
