package graft.merge

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Regressions from the round-1 review of the write paths. */
class ScdRegressionSpec extends SparkSpec {
  import spark.implicits._

  test("writeScd2 works on a PARTITIONED table across batches (read-then-overwrite)") {
    val table = new ParquetTable(spark, tmpDir("scd2part"), partitionKeys = Seq("region"))
    val insertMap = Map(
      "k" -> "updates.k", "v" -> "updates.v", "region" -> "updates.region",
      "current_flag" -> "true", "eff" -> "updates.eff",
      "expiry" -> "cast(null as string)")
    def write(batch: org.apache.spark.sql.DataFrame, txnV: Long): Unit =
      Scd.writeScd2(table, batch, Seq("k"),
        matchCondition = "target.current_flag = true AND target.v <> updates.v",
        updateMap = Map("current_flag" -> "false", "expiry" -> "updates.eff"),
        insertMap = insertMap, txn = Some(("app2", txnV)))

    // batch 0 bootstraps the table SCD2-shaped through the insertMap
    write(Seq((1, "a", "eu", "d1"), (2, "b", "us", "d1")).toDF("k", "v", "region", "eff"), 0L)
    assert(table.read.columns.toSet ==
      Set("k", "v", "region", "current_flag", "eff", "expiry"))
    // batch 1 merges in place on the partitioned table (regression: this
    // previously failed with 'cannot overwrite a path being read from')
    write(Seq((1, "a2", "eu", "d2")).toDF("k", "v", "region", "eff"), 1L)
    val rows = table.read.select("k", "v", "current_flag")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getBoolean(2))).toSet
    assert(rows == Set((1, "a", false), (1, "a2", true), (2, "b", true)))
    // replaying batch 1 (checkpoint recovery) is a no-op
    val v = table.latestVersion
    write(Seq((1, "a2", "eu", "d2")).toDF("k", "v", "region", "eff"), 1L)
    assert(table.latestVersion == v)
    // replaying batch 0 (the CREATE) is also a no-op now
    write(Seq((9, "z", "eu", "d1")).toDF("k", "v", "region", "eff"), 0L)
    assert(table.read.filter($"k" === 9).count() == 0)
  }

  /** (partition-dir -> file-name -> bytes) snapshot of a partitioned table. */
  private def partitionFiles(root: String): Map[String, Map[String, Seq[Byte]]] = {
    val data = new java.io.File(s"$root/data")
    data.listFiles().filter(_.isDirectory).map { d =>
      d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet")).map { f =>
        f.getName -> java.nio.file.Files.readAllBytes(f.toPath).toSeq
      }.toMap
    }.toMap
  }

  test("writeScd2 merges touched partitions only; untouched files byte-identical") {
    val table = new ParquetTable(spark, tmpDir("scd2prune"), partitionKeys = Seq("region"))
    val insertMap = Map(
      "k" -> "updates.k", "v" -> "updates.v", "region" -> "updates.region",
      "current_flag" -> "true", "eff" -> "updates.eff",
      "expiry" -> "cast(null as string)")
    def write(batch: org.apache.spark.sql.DataFrame): Unit =
      Scd.writeScd2(table, batch, Seq("k"),
        matchCondition = "target.current_flag = true AND target.v <> updates.v",
        updateMap = Map("current_flag" -> "false", "expiry" -> "updates.eff"),
        insertMap = insertMap)

    write(Seq((1, "a", "eu", "d1"), (2, "b", "us", "d1"), (3, "c", "ap", "d1"))
      .toDF("k", "v", "region", "eff"))
    val before = partitionFiles(table.root)
    assert(before.keySet == Set("region=eu", "region=us", "region=ap"))

    // batch touches ONLY region=eu
    write(Seq((1, "a2", "eu", "d2")).toDF("k", "v", "region", "eff"))
    val after = partitionFiles(table.root)
    // untouched partitions: identical file names AND identical bytes
    assert(after("region=us") == before("region=us"))
    assert(after("region=ap") == before("region=ap"))
    // touched partition was rewritten (old + expired + new version)
    val eu = table.read.filter($"region" === "eu")
      .select("k", "v", "current_flag").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getBoolean(2))).toSet
    assert(eu == Set((1, "a", false), (1, "a2", true)))
    assert(table.lastMetrics.get("numSourceRows").contains("1"))
  }

  test("writeScd4 merges current's touched partitions only") {
    val cur = new ParquetTable(spark, tmpDir("s4prune"), partitionKeys = Seq("region"))
    val hist = new ParquetTable(spark, tmpDir("s4pruneH"))
    val ts0 = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")
    def batch(rows: Seq[(Int, String, String)]) = rows
      .map { case (k, v, r) => (k, v, r, false, true, ts0) }
      .toDF("k", "v", "region", "deleted_flag", "row_active", "updated_at")
    Scd.writeScd4(cur, hist, batch(Seq((1, "a", "eu"), (2, "b", "us"))), Seq("k"))
    val before = partitionFiles(cur.root)

    Scd.writeScd4(cur, hist, batch(Seq((1, "a2", "eu"))), Seq("k"))
    val after = partitionFiles(cur.root)
    assert(after("region=us") == before("region=us")) // untouched, byte-identical
    assert(cur.read.filter($"k" === 1).select("v").as[String].collect().toSeq == Seq("a2"))
    assert(hist.read.count() == 1) // old eu row snapshotted
  }

  test("emptied-partition cleanup handles Hive-escaped partition values") {
    val t = new ParquetTable(spark, tmpDir("esc"), partitionKeys = Seq("p"))
    // ':' is Hive-escaped to %3A in directory names
    t.create(Seq((1, "10:30"), (2, "11:45")).toDF("k", "p"))
    t.merge(Seq((1, "10:30")).toDF("k", "p"), "target.k = updates.k",
      matched = Seq(MergeInto.WhenMatched(None, MergeInto.Delete)),
      notMatched = Nil)
    assert(t.read.select("p").as[String].collect().toSeq == Seq("11:45"))
    // the escaped directory of the emptied partition must be gone
    val dirs = new java.io.File(s"${t.root}/data").list().filter(_.startsWith("p="))
    assert(dirs.toSeq == Seq("p=11%3A45"))
  }

  test("writeScd4 records the txn on BOTH tables: replay appends no duplicate history") {
    val cur = new ParquetTable(spark, tmpDir("s4cur"))
    val hist = new ParquetTable(spark, tmpDir("s4hist"))
    val ts0 = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")
    def batch(v: String) = Seq((1, v, false, true, ts0))
      .toDF("k", "v", "deleted_flag", "row_active", "updated_at")
    Scd.writeScd4(cur, hist, batch("v1"), Seq("k"), txn = Some(("a", 0L)))
    Scd.writeScd4(cur, hist, batch("v2"), Seq("k"), txn = Some(("a", 1L)))
    assert(hist.read.count() == 1)
    Scd.writeScd4(cur, hist, batch("v2"), Seq("k"), txn = Some(("a", 1L))) // replay
    assert(hist.read.count() == 1) // no duplicate snapshot
    assert(cur.read.select("v").as[String].collect().toSeq == Seq("v2"))
  }

  test("writeScd1/4 bootstrap applies insert-clause logic (tombstones excluded)") {
    val cur = new ParquetTable(spark, tmpDir("s4boot"))
    val hist = new ParquetTable(spark, tmpDir("s4bootH"))
    val ts0 = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")
    val first = Seq(
      (1, "live", false, true, ts0),
      (2, "ghost", false, false, ts0) // delete tombstone in the FIRST batch
    ).toDF("k", "v", "deleted_flag", "row_active", "updated_at")
    Scd.writeScd4(cur, hist, first, Seq("k"))
    assert(cur.read.select("k").as[Int].collect().toSeq == Seq(1)) // ghost not live

    val t1 = new ParquetTable(spark, tmpDir("s1boot"))
    Scd.writeScd1(t1, first, Seq("k"),
      notMatched = Seq(MergeInto.WhenNotMatched(Some("updates.row_active = true"),
        MergeInto.InsertAll)))
    assert(t1.read.select("k").as[Int].collect().toSeq == Seq(1))
  }

  test("operator key specs parse correctly for both sides") {
    assert(MergeInto.extractJoinKeys(Seq("a != b", "x < y", "k")) == Seq("b", "y", "k"))
    assert(MergeInto.extractTargetKeys(Seq("a != b", "x < y", "k")) == Seq("a", "x", "k"))
  }

  test("concurrent appends to one table keep every commit (journal race)") {
    val t = new ParquetTable(spark, tmpDir("conc"))
    t.create(Seq((0, "seed")).toDF("k", "v"))
    val threads = (1 to 4).map { i =>
      new Thread(() => t.append(Seq((i, s"row$i")).toDF("k", "v")))
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(t.read.count() == 5)       // no lost appends
    assert(t.latestVersion == 4L)     // one commit per append
  }

  test("concurrent SCD1 merges on disjoint keys serialize to the union") {
    // the per-root monitor makes interleaved merges SERIALIZE (each reads
    // the previous writer's committed snapshot): four threads upserting
    // disjoint key ranges must all land — a lost update here would mean a
    // merge read a stale snapshot while another writer's COW was in flight
    val t = new ParquetTable(spark, tmpDir("conc_merge"))
    t.create(Seq((0, "seed")).toDF("k", "v"))
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 4).map { i =>
      new Thread(() =>
        try Scd.writeScd1(t,
          Seq((i * 10, s"v$i"), (i * 10 + 1, s"w$i")).toDF("k", "v"),
          Seq("k"))
        catch { case e: Throwable => failures.add(e) })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(failures.isEmpty, s"merge threads failed: ${failures.peek()}")
    val rows = t.read.collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(rows.size == 9, s"lost updates: $rows")
    (1 to 4).foreach { i =>
      assert(rows(i * 10) == s"v$i" && rows(i * 10 + 1) == s"w$i")
    }
    assert(t.latestVersion == 4L)     // one MERGE commit per thread
  }
}
