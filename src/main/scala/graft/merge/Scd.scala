package graft.merge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import MergeInto._

/** SCD Type 1 / 2 / 4 maintenance, the reference's flagship capability
  * (reference M/utility/Utility.scala:394-707 batch,
  * :731-1045 streaming twins). Each SCD is exposed twice:
  *
  *   - `scdNApply`: PURE DataFrame -> DataFrame semantics (target contents +
  *     update batch -> post-merge contents). This is the unit the DuckDB
  *     oracle can check and the form used by `SparkEntry.queries`.
  *   - `writeScdN`: table-backed variant over [[ParquetTable]] with dedup,
  *     partition-pruned COW rewrite and commit metrics.
  *
  * Scale: each SCD application is one shuffled equi-join on the merge keys
  * (broadcast when the batch is small) + codegen'd CASE projection; the
  * table-backed path rewrites only touched partitions.
  */
object Scd {

  /** Windowed dedup: keep ONE row per join key, ranked by `orderCols`.
    * The reference orders ASCENDING on updated_at — keeping the OLDEST update
    * (ref M/utility/Utility.scala:406-413, a likely bug, see SURVEY §2.14).
    * Default here keeps the NEWEST; `strictParity=true` restores reference
    * behavior. */
  def dedupByKey(df: DataFrame, keys: Seq[String], orderCols: Seq[String],
                 strictParity: Boolean = false): DataFrame = {
    if (orderCols.isEmpty) return df.dropDuplicates(keys)
    val ord = orderCols.map(c => if (strictParity) col(c).asc else col(c).desc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  // -------------------------------------------------------------------------
  // SCD TYPE 1 — upsert in place (ref M/utility/Utility.scala:394-479)
  // -------------------------------------------------------------------------

  /** Default clause set: updateAll on match, insertAll otherwise; callers pass
    * the reference's ordered clause list for the full matrix (conditional
    * update / delete / conditional insert). */
  def scd1Apply(target: DataFrame, updates: DataFrame, keySpecs: Seq[String],
                matched: Seq[WhenMatched] = Seq(WhenMatched(None, UpdateAll)),
                notMatched: Seq[WhenNotMatched] = Seq(WhenNotMatched(None, InsertAll)),
                extraCondition: Option[String] = None): DataFrame =
    MergeInto(target, updates, buildJoinCondition(keySpecs, extraCondition),
      matched, notMatched)

  def writeScd1(table: ParquetTable, updates: DataFrame, keySpecs: Seq[String],
                matched: Seq[WhenMatched] = Seq(WhenMatched(None, UpdateAll)),
                notMatched: Seq[WhenNotMatched] = Seq(WhenNotMatched(None, InsertAll)),
                dedupOrderCols: Seq[String] = Nil,
                extraCondition: Option[String] = None,
                txn: Option[(String, Long)] = None): Unit = table.withLock {
    val keys = extractJoinKeys(keySpecs)
    val deduped = if (dedupOrderCols.nonEmpty) dedupByKey(updates, keys, dedupOrderCols)
                  else updates
    if (!table.exists) {
      // Bootstrap applies the INSERT clause logic, not the raw batch: a
      // first batch containing delete tombstones (e.g. row_active=false
      // rows excluded by a conditional insert) must not become live rows.
      // Joining on `false` makes every update row take the not-matched path.
      val seeded = MergeInto(deduped.filter(lit(false)), deduped, "false",
        Nil, notMatched)
      table.create(seeded, txn = txn) // txn recorded so a replayed batch 0 is skipped
    } else {
      if (txn.exists { case (a, v) => table.seenTxn(a, v) }) return // before paying count()
      table.merge(deduped, buildJoinCondition(keySpecs, extraCondition),
        matched, notMatched, txn,
        metrics = Map("numSourceRows" -> deduped.count().toString))
    }
  }

  // -------------------------------------------------------------------------
  // SCD TYPE 2 — row-versioned history (ref M/utility/Utility.scala:493-608)
  // -------------------------------------------------------------------------

  /** SCD2 via the staged-union trick the reference uses
    * (ref M/utility/Utility.scala:541-587): each changed update row appears
    * TWICE in the merge source — once keyed (expires the old current row via
    * `updateMap`) and once with NULL merge keys (falls through to the insert
    * clause, creating the new current version). One merge does both.
    *
    * @param keySpecs        join key specs ("k" or "tk = uk")
    * @param matchCondition  which matched rows count as changed, e.g.
    *                        "target.current_flag = true AND target.v <> updates.v"
    * @param updateMap       SET map expiring the old row
    *                        (e.g. "current_flag" -> "false", "expiry_at" -> "updates.eff_date")
    * @param insertMap       VALUES map creating the new current row
    */
  /** The staged merge source + condition implementing the union trick —
    * shared by the pure `scd2Apply` and the table-backed `writeScd2` so the
    * write path can route the SAME source through the partition-pruned
    * `ParquetTable.merge` instead of a full-table rewrite. */
  private def scd2Source(target: DataFrame, updates: DataFrame, keySpecs: Seq[String],
                         matchCondition: String,
                         extraCondition: Option[String]): (DataFrame, String) = {
    val uKeys = extractJoinKeys(keySpecs)
    val tKeys = extractTargetKeys(keySpecs)

    // Rows needing a NEW version: updates that match a current row AND differ
    // (ref M/utility/Utility.scala:534-538).
    val t = target.alias("target")
    val u = updates.alias("updates")
    val joinCond = expr(buildJoinCondition(keySpecs, extraCondition))
    val rowsToInsert = u.join(t, joinCond, "inner")
      .where(expr(matchCondition))
      .select(updates.columns.map(c => col(s"updates.$c")): _*)

    // Staged source: inserts carry NULL mergekeys, updates carry real keys.
    val mergeKeyCols = uKeys.indices.map(i => s"__mergekey_$i")
    val stagedInserts = mergeKeyCols.zip(uKeys).foldLeft(rowsToInsert) {
      case (d, (mk, k)) => d.withColumn(mk, lit(null).cast(updates.schema(k).dataType))
    }
    val stagedUpdates = mergeKeyCols.zip(uKeys).foldLeft(updates) {
      case (d, (mk, k)) => d.withColumn(mk, col(k))
    }
    val staged = stagedInserts.unionByName(stagedUpdates)

    val mergeCond = tKeys.zip(mergeKeyCols)
      .map { case (tk, mk) => s"target.$tk = updates.$mk" }
      .++(extraCondition.toSeq).mkString(" AND ")
    (staged, mergeCond)
  }

  def scd2Apply(target: DataFrame, updates: DataFrame, keySpecs: Seq[String],
                matchCondition: String,
                updateMap: Map[String, String],
                insertMap: Map[String, String],
                extraCondition: Option[String] = None): DataFrame = {
    val (staged, mergeCond) = scd2Source(target, updates, keySpecs,
      matchCondition, extraCondition)
    MergeInto(target, staged, mergeCond,
      matched = Seq(WhenMatched(Some(matchCondition), UpdateExpr(updateMap))),
      notMatched = Seq(WhenNotMatched(None, InsertExpr(insertMap))))
  }

  /** Temporal (point-in-time) join of a fact table against an SCD2
    * dimension: each fact row picks the dimension VERSION that was valid
    * on its own date — `eff ≤ factDate < expiry` (open expiry = NULL), the
    * half-open convention under which exactly one version matches any
    * date (a version expiring on D hands D to its successor). This is the
    * read side of [[scd2Apply]]/[[writeScd2]]: history exists so facts can
    * be joined to the dimension AS IT WAS, not as it is.
    *
    * Plan shape: a plain hash equi-join on the business key with the
    * validity window as a post-join residual filter — never a range/theta
    * join, because the SCD2 invariant (non-overlapping versions per key)
    * guarantees at most `versions-per-key` candidates per fact, a small
    * constant in any real dimension. Left join keeps orphan facts (their
    * dimension columns come back NULL — the audit signal, same stance as
    * [[graft.operators.DataQuality.referentialIntegrity]]). */
  def scd2TemporalJoin(facts: DataFrame, dim: DataFrame,
                       factKey: String, dimKey: String, factDateCol: String,
                       effCol: String = "eff_date",
                       expCol: String = "expiry_date"): DataFrame =
    facts.alias("f").join(dim.alias("d"),
      col(s"f.$factKey") === col(s"d.$dimKey") &&
        col(s"d.$effCol") <= col(s"f.$factDateCol") &&
        (col(s"d.$expCol").isNull ||
          col(s"d.$expCol") > col(s"f.$factDateCol")),
      "left")

  def writeScd2(table: ParquetTable, updates: DataFrame, keySpecs: Seq[String],
                matchCondition: String,
                updateMap: Map[String, String],
                insertMap: Map[String, String],
                dedupOrderCols: Seq[String] = Nil,
                extraCondition: Option[String] = None,
                txn: Option[(String, Long)] = None): Unit = table.withLock {
    val keys = extractJoinKeys(keySpecs)
    val deduped = if (dedupOrderCols.nonEmpty) dedupByKey(updates, keys, dedupOrderCols)
                  else updates
    if (!table.exists) {
      // Bootstrap must already be SCD2-SHAPED (current_flag/expiry columns
      // the later matchCondition references): evaluate the insertMap over the
      // batch — exactly the rows the not-matched clause would have produced.
      val seeded = deduped.alias("updates").select(insertMap.toSeq.map {
        case (k, v) => expr(v).as(k.split('.').last)
      }: _*)
      table.create(seeded, txn = txn)
      return
    }
    if (txn.exists { case (a, v) => table.seenTxn(a, v) }) return
    // Partition-bounded SCD2 (ref splices manual DPP into its SCD2 merge,
    // M/utility/Utility.scala:524-527,548-551): the rows-to-insert probe joins
    // against only the partitions the batch touches, and the staged source —
    // whose insert rows carry real partition values — rides through
    // ParquetTable.merge's touched-partition COW. A CDC micro-batch neither
    // reads nor rewrites untouched partitions.
    val (staged, mergeCond) = scd2Source(table.readPruned(deduped), deduped,
      keySpecs, matchCondition, extraCondition)
    table.merge(staged, mergeCond,
      matched = Seq(WhenMatched(Some(matchCondition), UpdateExpr(updateMap))),
      notMatched = Seq(WhenNotMatched(None, InsertExpr(insertMap))),
      txn = txn, metrics = Map("numSourceRows" -> deduped.count().toString))
  }

  // -------------------------------------------------------------------------
  // SCD TYPE 4 — current table + history table (ref M/utility/Utility.scala:621-707)
  // -------------------------------------------------------------------------

  /** Returns (newCurrent, historyAppendRows).
    *
    * Matched current rows are snapshotted into history (stamped
    * `history_created_at` from the update's `updatedAtCol`,
    * ref M/utility/Utility.scala:645-676), then the current table takes an
    * SCD1 merge where `row_active = false` updates soft-delete
    * (`deleted_flag = true`) instead of updating. */
  /** SCD4's current-table clause matrix: `row_active = false` soft-deletes,
    * everything else upserts. Shared by the pure and table-backed paths. */
  private val scd4Matched = Seq(
    WhenMatched(Some("updates.row_active = false"),
      UpdateExpr(Map("deleted_flag" -> "true"))),
    WhenMatched(None, UpdateAll))
  private val scd4NotMatched =
    Seq(WhenNotMatched(Some("updates.row_active = true"), InsertAll))

  /** Matched current rows snapshotted for the history table, stamped with the
    * update's timestamp (ref M/utility/Utility.scala:645-676). */
  private def scd4HistoryRows(current: DataFrame, updates: DataFrame,
                              keySpecs: Seq[String], updatedAtCol: String,
                              extraCondition: Option[String]): DataFrame = {
    val joinCond = expr(buildJoinCondition(keySpecs, extraCondition))
    current.alias("target")
      .join(updates.alias("updates"),
        joinCond && col("updates.row_active") === lit(true), "inner")
      .select(current.columns.map(c => col(s"target.$c")) :+
        col(s"updates.$updatedAtCol").cast("timestamp").as("history_created_at"): _*)
  }

  def scd4Apply(current: DataFrame, updates: DataFrame, keySpecs: Seq[String],
                updatedAtCol: String = "updated_at",
                extraCondition: Option[String] = None): (DataFrame, DataFrame) = {
    val historyRows = scd4HistoryRows(current, updates, keySpecs, updatedAtCol,
      extraCondition)
    val newCurrent = scd1Apply(current, updates, keySpecs,
      matched = scd4Matched, notMatched = scd4NotMatched,
      extraCondition = extraCondition)
    (newCurrent, historyRows)
  }

  def writeScd4(current: ParquetTable, history: ParquetTable, updates: DataFrame,
                keySpecs: Seq[String], updatedAtCol: String = "updated_at",
                dedupOrderCols: Seq[String] = Nil,
                extraCondition: Option[String] = None,
                txn: Option[(String, Long)] = None): Unit = current.withLock {
    val keys = extractJoinKeys(keySpecs)
    val deduped = if (dedupOrderCols.nonEmpty) dedupByKey(updates, keys, dedupOrderCols)
                  else updates
    if (!current.exists) {
      // Only ACTIVE rows seed the table (a delete tombstone in the first
      // batch must not appear as a live current row).
      val seeded = MergeInto(deduped.filter(lit(false)), deduped, "false",
        Nil, Seq(WhenNotMatched(Some("updates.row_active = true"), InsertAll)))
      current.create(seeded, txn = txn)
      return
    }
    if (txn.exists { case (a, v) => current.seenTxn(a, v) }) return
    // Partition-bounded SCD4: the history snapshot join reads only the
    // partitions the batch touches, and the current table takes the same
    // clause matrix through ParquetTable.merge's touched-partition COW
    // instead of a full-table overwrite. History is appended FIRST — it
    // materializes while current's data files are still the ones its plan
    // reads; the txn record rides on BOTH tables so a replayed batch neither
    // re-appends history nor re-merges current.
    val histRows = scd4HistoryRows(current.readPruned(deduped), deduped,
      keySpecs, updatedAtCol, extraCondition)
    history.append(histRows, txn = txn)
    current.merge(deduped, buildJoinCondition(keySpecs, extraCondition),
      matched = scd4Matched, notMatched = scd4NotMatched,
      txn = txn, metrics = Map("numSourceRows" -> deduped.count().toString))
  }
}
