package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import EventTimeOps.{HllUpdate, TypedEvent}

/** Streaming HLL distinct: bit-parity with the batch operator and the
  * same mid-commit crash-replay gate the debounce/EWMA operators carry. */
class HllStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("stream estimate is bit-identical to the batch hllDistinct") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    // two types, overlapping user sets, delivered across three triggers
    // with repeats (distinct must not double-count re-seen users)
    val b1 = (1 to 40).map(u => TypedEvent(u.toLong, ts(1), "click"))
    val b2 = (30 to 70).map(u => TypedEvent(u.toLong, ts(2), "click")) ++
      (1 to 25).map(u => TypedEvent(u.toLong, ts(3), "view"))
    val b3 = (1 to 40).map(u => TypedEvent(u.toLong, ts(4), "click")) // all repeats
    val mem = MemoryStream[TypedEvent]
    val q = EventTimeOps.streamingHllDistinct(mem.toDS())
      .writeStream.outputMode("update").format("memory")
      .queryName("hll_stream").start()
    mem.addData(b1); q.processAllAvailable()
    mem.addData(b2); q.processAllAvailable()
    mem.addData(b3); q.processAllAvailable()
    q.stop()
    // last update per key
    val got = spark.table("hll_stream").as[HllUpdate].collect()
      .groupBy(_.event_type)
      .map { case (k, us) => k -> us.maxBy(_.n_events) }
    assert(got("click").n_events == 121L)
    assert(got("view").n_events == 25L)
    // batch twin over the SAME rows
    val batchDf = (b1 ++ b2 ++ b3).toDF()
    val batch = graft.operators.Sketches.hllDistinct(
        batchDf, "user_id", Seq("event_type"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(batch("click")._1 == 70L && batch("view")._1 == 25L)
    assert(got("click").hll_distinct == batch("click")._2,
      s"stream ${got("click").hll_distinct} != batch ${batch("click")._2}")
    assert(got("view").hll_distinct == batch("view")._2)
  }

  test("kill at the state-store boundary cannot double-count the replay") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val ckpt = tmpDir("hll_ckpt")
    val table = new graft.merge.ParquetTable(spark, tmpDir("hll_table"))
    val mem = MemoryStream[TypedEvent]
    def runOnce(): Unit = {
      val q = EventTimeOps.streamingHllDistinct(mem.toDS())
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[HllUpdate], id: Long) =>
          table.append(batch.toDF(), txn = Some(("hll_gate", id)))
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    mem.addData((1 to 30).map(u => TypedEvent(u.toLong, ts(1), "click")): _*)
    runOnce()
    val after1 = table.read.as[HllUpdate].collect().maxBy(_.n_events)
    assert(after1.n_events == 30L)
    // batch 2 re-sends users 11-30 plus 10 new ones, crashing mid-commit
    mem.addData((11 to 40).map(u => TypedEvent(u.toLong, ts(2), "click")): _*)
    table.onPreCommit = () => throw new RuntimeException("injected crash")
    intercept[Exception] { runOnce() }
    table.onPreCommit = () => ()
    runOnce() // replay against restored pre-batch state
    val ups = table.read.as[HllUpdate].collect()
    val last = ups.maxBy(_.n_events)
    // events counter replays exactly once; registers are monotone-merge
    // idempotent, so the estimate equals the batch twin on 40 distinct
    assert(last.n_events == 60L, s"replay double-counted: $ups")
    val batch = graft.operators.Sketches.hllDistinct(
        (1 to 40).map(u => TypedEvent(u.toLong, ts(9), "click")).toDF(),
        "user_id", Seq("event_type")).head().getDouble(2)
    assert(last.hll_distinct == batch)
    // idle restart changes nothing
    val v = table.latestVersion
    runOnce()
    assert(table.latestVersion == v)
  }
}
