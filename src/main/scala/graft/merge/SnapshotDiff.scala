package graft.merge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table-version diffing: given two snapshots of a keyed table, classify
  * every key as added / removed / changed / unchanged — the validation step
  * run after any SCD merge or backfill ("what did this batch actually do"),
  * and the input to incremental downstream refresh ("recompute only changed
  * keys"). Complements [[MergeInto]]/[[Scd]], which PRODUCE new versions.
  */
object SnapshotDiff {

  /** Null-safe row fingerprint over the compare columns: each column is
    * hashed SEPARATELY (null -> a 32-char non-hex sentinel that no md5
    * digest can equal) and the fixed-width tokens are concatenated into the
    * row hash. Fixed-width tokens make the encoding injection-proof: no
    * separator byte a VALUE could contain can shift column boundaries
    * (`("ab", "c")` vs `("a", "bc")` still differ), and null never collides
    * with any literal string. The join then moves a key plus one 32-char
    * hash per side, never the row bodies — at 100 TB the diff shuffles
    * O(keys), not O(table width x keys). */
  private val nullToken = "n" * 32 // not hex => outside md5's output range
  private def fingerprint(cols: Seq[String]) =
    md5(concat(
      cols.map(c => coalesce(md5(col(c).cast("string")), lit(nullToken))): _*))

  /** Per-key change classification between `oldDf` and `newDf`.
    *
    * One full-outer join on the key columns, each side reduced to
    * (keys, fingerprint) first; column pruning means the scans read only
    * keys + compared columns. Returns keys..., `change_type` in
    * {added, removed, changed, unchanged}. */
  def diff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
           compareCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty && compareCols.nonEmpty, "keys and compareCols")
    val o = oldDf.select((keys.map(col) :+ fingerprint(compareCols).as("__fp_old")): _*)
    val n = newDf.select((keys.map(col) :+ fingerprint(compareCols).as("__fp_new")): _*)
    o.join(n, keys, "full_outer")
      .select(keys.map(col) :+
        when(col("__fp_old").isNull, "added")
          .when(col("__fp_new").isNull, "removed")
          .when(col("__fp_old") =!= col("__fp_new"), "changed")
          .otherwise("unchanged").as("change_type"): _*)
  }

  /** [[diff]] reduced to the batch-report shape: row counts per change
    * type (the journal line a pipeline writes after each merge). */
  def diffSummary(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
                  compareCols: Seq[String]): DataFrame =
    diff(oldDf, newDf, keys, compareCols)
      .groupBy(col("change_type"))
      .agg(count(lit(1)).cast("long").as("n_keys"))
}
