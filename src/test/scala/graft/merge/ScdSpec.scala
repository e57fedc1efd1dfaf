package graft.merge

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._
import graft.SparkSpec
import MergeInto._

class ScdSpec extends SparkSpec {
  import spark.implicits._

  test("dedupByKey keeps newest by default, oldest under strictParity") {
    val df = Seq((1, "a", 10), (1, "b", 20), (2, "c", 5))
      .toDF("k", "v", "updated_at")
    val newest = Scd.dedupByKey(df, Seq("k"), Seq("updated_at"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(newest == Map(1 -> "b", 2 -> "c"))
    val oldest = Scd.dedupByKey(df, Seq("k"), Seq("updated_at"), strictParity = true)
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(oldest == Map(1 -> "a", 2 -> "c")) // reference's ascending order
  }

  test("scd2Apply expires changed current rows and inserts new versions") {
    val target = Seq(
      (1, "v1", true, Date.valueOf("2024-01-01"), null.asInstanceOf[Date]),
      (2, "v1", true, Date.valueOf("2024-01-01"), null.asInstanceOf[Date])
    ).toDF("k", "v", "current_flag", "eff_date", "expiry_date")
    val updates = Seq(
      (1, "v2", Date.valueOf("2024-06-01")),  // changed -> expire + new version
      (2, "v1", Date.valueOf("2024-06-01")),  // unchanged -> no-op
      (3, "v1", Date.valueOf("2024-06-01"))   // fresh -> plain insert
    ).toDF("k", "v", "eff_date")
    val out = Scd.scd2Apply(target, updates, Seq("k"),
      matchCondition = "target.current_flag = true AND target.v <> updates.v",
      updateMap = Map("current_flag" -> "false", "expiry_date" -> "updates.eff_date"),
      insertMap = Map("k" -> "updates.k", "v" -> "updates.v", "current_flag" -> "true",
        "eff_date" -> "updates.eff_date", "expiry_date" -> "cast(null as date)"))
    val rows = out.collect().map(r =>
      (r.getInt(0), r.getString(1), r.getBoolean(2), r.get(4))).toSet
    assert(rows == Set(
      (1, "v1", false, Date.valueOf("2024-06-01")), // expired old version
      (1, "v2", true, null),                        // new current version
      (2, "v1", true, null),                        // untouched
      (3, "v1", true, null)))                       // fresh insert
  }

  test("scd4Apply snapshots history and soft-deletes inactive rows") {
    val current = Seq((1, "a", false), (2, "b", false), (3, "c", false))
      .toDF("k", "v", "deleted_flag")
    val ts = Timestamp.valueOf("2024-06-01 00:00:00")
    val updates = Seq(
      (1, "a2", false, true, ts),   // active update -> history + update
      (2, "b", false, false, ts),   // row_active=false -> soft delete, NO history
      (4, "d", false, true, ts)     // new active -> insert
    ).toDF("k", "v", "deleted_flag", "row_active", "updated_at")
    val (cur, hist) = Scd.scd4Apply(current, updates, Seq("k"))
    val curRows = cur.collect().map(r => (r.getInt(0), r.getString(1), r.getBoolean(2))).toSet
    assert(curRows == Set((1, "a2", false), (2, "b", true), (3, "c", false), (4, "d", false)))
    val histRows = hist.collect().map(r => (r.getInt(0), r.getString(1), r.getTimestamp(3))).toSet
    assert(histRows == Set((1, "a", ts))) // only the active-matched old row
  }

  test("writeScd1 round-trips through a ParquetTable with dedup and txn skip") {
    val dir = tmpDir("scd1")
    val table = new ParquetTable(spark, dir)
    val base = Seq((1, "a", 1), (2, "b", 1)).toDF("k", "v", "updated_at")
    Scd.writeScd1(table, base, Seq("k"))
    // duplicate keys in the batch: dedup keeps the NEWEST (updated_at desc)
    val batch = Seq((1, "a-old", 2), (1, "a-new", 3), (3, "c", 2))
      .toDF("k", "v", "updated_at")
    Scd.writeScd1(table, batch, Seq("k"), dedupOrderCols = Seq("updated_at"),
      txn = Some(("app", 1L)))
    val after = table.read.collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(after == Map(1 -> "a-new", 2 -> "b", 3 -> "c"))
    // replaying the same txn version must be a no-op
    Scd.writeScd1(table, Seq((1, "zzz", 9)).toDF("k", "v", "updated_at"),
      Seq("k"), txn = Some(("app", 1L)))
    assert(table.read.filter(col("v") === "zzz").count() == 0)
  }

  test("writeScd4 maintains current + history tables") {
    val curT = new ParquetTable(spark, tmpDir("scd4cur"))
    val histT = new ParquetTable(spark, tmpDir("scd4hist"))
    val ts = Timestamp.valueOf("2024-06-01 00:00:00")
    Scd.writeScd4(curT, histT,
      Seq((1, "a", false, true, ts)).toDF("k", "v", "deleted_flag", "row_active", "updated_at"),
      Seq("k"))
    Scd.writeScd4(curT, histT,
      Seq((1, "a2", false, true, ts)).toDF("k", "v", "deleted_flag", "row_active", "updated_at"),
      Seq("k"))
    assert(curT.read.select("v").as[String].collect().toSet == Set("a2"))
    assert(histT.read.count() == 1) // first version snapshotted
  }

  test("scd2TemporalJoin: each fact picks exactly its own-date version; boundary goes to the successor") {
    def d(s: String) = Date.valueOf(s)
    // key 1: v1 [2020-01-01, 2021-01-01), v2 [2021-01-01, null)
    // key 2: one open version. key 3 absent from the dimension.
    val dim = Seq(
      (1L, "v1", d("2020-01-01"), Option(d("2021-01-01"))),
      (1L, "v2", d("2021-01-01"), Option.empty[Date]),
      (2L, "only", d("2020-06-01"), Option.empty[Date])
    ).toDF("k", "ver", "eff_date", "expiry_date")
    val facts = Seq(
      (10L, 1L, d("2020-05-05")), // inside v1
      (11L, 1L, d("2021-01-01")), // BOUNDARY: successor's day
      (12L, 1L, d("2023-01-01")), // open v2
      (13L, 1L, d("2019-12-31")), // before any version
      (14L, 2L, d("2020-07-01")), // single-version key
      (15L, 3L, d("2020-07-01"))  // orphan key
    ).toDF("fid", "k", "fdate")
    val out = Scd.scd2TemporalJoin(facts, dim, "k", "k", "fdate")
      .select(col("fid"), col("ver"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(out == Map(10L -> "v1", 11L -> "v2", 12L -> "v2",
      13L -> null, 14L -> "only", 15L -> null))
    assert(out.size == facts.count(), "at most one version per fact")
  }
}
