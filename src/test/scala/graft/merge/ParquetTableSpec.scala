package graft.merge

import org.apache.spark.sql.functions._
import graft.SparkSpec
import MergeInto._

class ParquetTableSpec extends SparkSpec {
  import spark.implicits._

  test("create/read/overwrite snapshots with commit log") {
    val t = new ParquetTable(spark, tmpDir("pt"))
    assert(!t.exists)
    t.create(Seq((1, "a")).toDF("k", "v"))
    assert(t.exists && t.latestVersion == 0)
    t.overwrite(Seq((2, "b")).toDF("k", "v"), Map("rows" -> "1"))
    assert(t.latestVersion == 1)
    assert(rowsOf(t.read) == Set(Seq(2, "b")))
    assert(t.lastMetrics == Map("rows" -> "1"))
  }

  test("append unions schemas (mergeSchema equivalent)") {
    val t = new ParquetTable(spark, tmpDir("pt_schema"))
    t.create(Seq((1, "a")).toDF("k", "v"))
    t.append(Seq((2, 9.5)).toDF("k", "extra"))
    val cols = t.read.columns.toSet
    assert(cols == Set("k", "v", "extra"))
    assert(t.read.filter(col("k") === 1).select("extra").collect().head.isNullAt(0))
  }

  test("partitioned merge rewrites only touched partitions and drops emptied ones") {
    val t = new ParquetTable(spark, tmpDir("pt_part"), partitionKeys = Seq("p"))
    t.create(Seq((1, "a", "p1"), (2, "b", "p2"), (3, "c", "p3")).toDF("k", "v", "p"))
    // update p1, delete the only row of p3 -> p3 directory must disappear
    t.merge(Seq((1, "a2", "p1"), (3, "c", "p3")).toDF("k", "v", "p"),
      "target.k = updates.k",
      matched = Seq(
        WhenMatched(Some("updates.k = 3"), Delete),
        WhenMatched(None, UpdateAll)),
      notMatched = Seq(WhenNotMatched(None, InsertAll)))
    val rows = t.read.collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(rows == Set((1, "a2"), (2, "b")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(t.root, "data", "p=p3")))
  }

  test("delete: SQL WHERE semantics, untouched partitions keep their files") {
    val t = new ParquetTable(spark, tmpDir("pt_del"), partitionKeys = Seq("p"))
    t.create(Seq((1, "a", "p1"), (2, "b", "p1"), (3, "c", "p2"),
      (4, null.asInstanceOf[String], "p3")).toDF("k", "v", "p"))
    val p2Before = java.nio.file.Files.list(
      java.nio.file.Paths.get(t.root, "data", "p=p2")).toArray.toSet
    // NULL predicate rows (v = 'zzz' is NULL for k=4) must be KEPT
    t.delete("k = 1 OR v = 'zzz'", metrics = Map("why" -> "erasure"))
    val rows = t.read.collect().map(_.getInt(0)).toSet
    assert(rows == Set(2, 3, 4), "k=1 gone; NULL-predicate k=4 kept")
    // p2/p3 had no matching rows: their files must be byte-identical
    val p2After = java.nio.file.Files.list(
      java.nio.file.Paths.get(t.root, "data", "p=p2")).toArray.toSet
    assert(p2After == p2Before, "an untouched partition was rewritten")
    assert(t.lastMetrics.get("why").contains("erasure"))
    // deleting a partition's last row drops its directory
    t.delete("k = 3")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(t.root, "data", "p=p2")))
    // txn replay is a no-op
    t.delete("k = 2", txn = Some(("gdpr", 1L)))
    t.delete("k = 4", txn = Some(("gdpr", 1L))) // replayed id: must not run
    assert(t.read.collect().map(_.getInt(0)).toSet == Set(4))
  }

  test("delete on a snapshot table writes a new version with kept rows") {
    val t = new ParquetTable(spark, tmpDir("pt_del_snap"))
    t.create(Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v"))
    val v0 = t.latestVersion
    t.delete("k >= 2")
    assert(t.latestVersion == v0 + 1)
    assert(t.read.collect().map(_.getInt(0)).toSeq == Seq(1))
  }

  test("vacuum drops expired snapshot versions, keeps log and current read") {
    val t = new ParquetTable(spark, tmpDir("pt_vac"))
    t.create(Seq((1, "a")).toDF("k", "v"))
    t.overwrite(Seq((2, "b")).toDF("k", "v"))
    t.overwrite(Seq((3, "c")).toDF("k", "v"))
    val snaps = java.nio.file.Paths.get(t.root, "snap")
    def versions = {
      import scala.jdk.CollectionConverters._
      val l = java.nio.file.Files.list(snaps)
      try l.iterator().asScala.map(_.getFileName.toString).toSet
      finally l.close()
    }
    assert(versions.size == 3)
    t.vacuum(keepLast = 1)
    assert(versions == Set(f"v${t.latestVersion}%05d"),
      "only the current snapshot's bytes survive")
    assert(t.read.collect().map(_.getInt(0)).toSeq == Seq(3))
    assert(t.latestVersion == 2, "commit log history intact")
    // partitioned layout: single live copy, vacuum is a safe no-op
    val p = new ParquetTable(spark, tmpDir("pt_vac_part"), Seq("p"))
    p.create(Seq((1, "a", "p1")).toDF("k", "v", "p"))
    p.vacuum()
    assert(p.read.count() == 1)
  }

  test("txn idempotency via seenTxn") {
    val t = new ParquetTable(spark, tmpDir("pt_txn"))
    t.create(Seq((1, "a")).toDF("k", "v"))
    t.append(Seq((2, "b")).toDF("k", "v"), txn = Some(("app", 7L)))
    t.append(Seq((2, "b")).toDF("k", "v"), txn = Some(("app", 7L))) // replay
    assert(t.read.count() == 2)
    assert(t.seenTxn("app", 7L) && !t.seenTxn("app", 8L))
  }

  test("seenTxn is O(1) after the initial fold: old commits never re-read") {
    val t = new ParquetTable(spark, tmpDir("pt_txn_fold"))
    t.create(Seq((1, "a")).toDF("k", "v"))
    (1L to 5L).foreach(i =>
      t.append(Seq((i.toInt, "x")).toDF("k", "v"), txn = Some(("app", i))))
    assert(t.seenTxn("app", 5L) && !t.seenTxn("app", 6L))
    // high-water covers a replay of ANY earlier batch (monotonic txn contract)
    assert(t.seenTxn("app", 2L))

    // a fresh instance folds the existing log exactly once...
    val t2 = new ParquetTable(spark, t.root)
    assert(t2.seenTxn("app", 3L))
    // ...after which old commit files are never consulted again: remove all
    // but the latest and the map must still answer every probe
    val log = new java.io.File(t.root, "_graft_log")
    log.listFiles.filter(_.getName.endsWith(".json"))
      .sortBy(_.getName).dropRight(1).foreach(f => assert(f.delete()))
    assert(t2.seenTxn("app", 5L) && !t2.seenTxn("app", 6L))
    assert(t2.seenTxn("app", 1L))
  }

  private def parquetFiles(dir: java.io.File): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles.toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
    walk(dir)
  }

  test("compact: snapshot table packs many small appends, contents unchanged") {
    val t = new ParquetTable(spark, tmpDir("pt_compact"))
    t.create(spark.range(0, 10).toDF("id").repartition(8))
    (1 to 4).foreach(i =>
      t.append(spark.range(i * 100, i * 100 + 10).toDF("id").repartition(8)))
    val before = t.read.collect().map(_.getLong(0)).sorted
    val vBefore = t.latestVersion
    val dirBefore = new java.io.File(t.root, f"snap/v$vBefore%05d")
    assert(parquetFiles(dirBefore).size > 8)
    t.compact() // default 128 MB target: tiny table -> 1 file
    assert(t.latestVersion == vBefore + 1)
    val dirAfter = new java.io.File(t.root, f"snap/v${t.latestVersion}%05d")
    assert(parquetFiles(dirAfter).size == 1)
    assert(t.read.collect().map(_.getLong(0)).sorted.toSeq == before.toSeq)
    assert(t.lastMetrics("filesBefore").toInt > 8)
    // re-compacting an already-packed table is a no-op (no empty commit)
    val v = t.latestVersion
    t.compact()
    assert(t.latestVersion == v)
  }

  test("compact: partitioned table collapses each partition's files in place") {
    import spark.implicits._
    val t = new ParquetTable(spark, tmpDir("pt_compact_part"),
      partitionKeys = Seq("p"))
    t.create(Seq((1L, "a"), (2L, "b")).toDF("id", "p").repartition(4))
    (1 to 4).foreach(i =>
      t.append(Seq((i * 10L, "a"), (i * 10L + 1, "b")).toDF("id", "p")
        .repartition(4)))
    val before = t.read.collect().map(r => (r.getLong(0), r.getString(1))).sorted
    val dataDir = new java.io.File(t.root, "data")
    assert(parquetFiles(dataDir).size > 2)
    t.compact()
    // one file per partition value is the floor for a hive layout
    assert(parquetFiles(dataDir).size == 2)
    assert(t.read.collect().map(r => (r.getLong(0), r.getString(1))).sorted
      .toSeq == before.toSeq)
    // replay protection rides the same txn record as every write
    t.append(Seq((99L, "a")).toDF("id", "p").repartition(3))
    val v = t.latestVersion
    t.compact(txn = Some(("compactor", 1L)))
    assert(t.latestVersion == v + 1)
    t.compact(txn = Some(("compactor", 1L))) // replayed -> skipped
    assert(t.latestVersion == v + 1)
  }

  test("append schema evolution fuzz: union schema, nulls where a batch lacked a column") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    // random append sequences with random column subsets: the table's
    // schema must converge to the union (mergeSchema equivalent), every
    // batch's values must survive verbatim, and columns a batch never
    // carried must read back NULL for its rows
    val pool = Seq("a", "b", "c")
    val genBatches = for {
      n <- Gen.choose(1, 5)
      sets <- Gen.listOfN(n, Gen.someOf(pool))
    } yield sets.map(_.toSeq.sorted)
    val prop = Prop.forAll(genBatches) { batches =>
      val t = new ParquetTable(spark, tmpDir("pt_evofuzz"))
      batches.zipWithIndex.foreach { case (cols, i) =>
        val schema = StructType(StructField("k", LongType, nullable = false) +:
          cols.map(c => StructField(c, LongType, nullable = true)))
        val row = Row.fromSeq(i.toLong +: cols.map(c =>
          (i * 10 + pool.indexOf(c)).toLong))
        t.append(spark.createDataFrame(
          java.util.Collections.singletonList(row), schema))
      }
      val seen = batches.flatten.distinct
      val schemaOk = t.read.columns.toSet == (Set("k") ++ seen)
      val rows = t.read.collect().map { r =>
        r.getLong(r.fieldIndex("k")) -> r
      }.toMap
      val valsOk = batches.zipWithIndex.forall { case (cols, i) =>
        val r = rows(i.toLong)
        seen.forall { c =>
          val idx = r.fieldIndex(c)
          if (cols.contains(c)) !r.isNullAt(idx) &&
            r.getLong(idx) == (i * 10 + pool.indexOf(c)).toLong
          else r.isNullAt(idx)
        }
      }
      if (!(schemaOk && valsOk && rows.size == batches.size))
        println(s"batches=$batches schema=${t.read.columns.toSeq} rows=$rows")
      schemaOk && valsOk && rows.size == batches.size
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
