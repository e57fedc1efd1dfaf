package graft.merge

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Row type for the SCD4 property model (top-level for the encoder). */
case class Scd4PropRow(k: Int, v: Int, row_active: Boolean,
                       deleted_flag: Boolean,
                       updated_at: java.sql.Timestamp)

/** Property-based check of the SCD4 (current + history) pair: random
  * multi-batch sequences with upserts, soft-delete tombstones, and
  * re-activations against a driver-side model — current holds the last
  * active state (tombstones flip ONLY deleted_flag), history accumulates
  * the pre-merge snapshot of every matched active update, stamped with
  * the update's timestamp. Then the crash-replay property over
  * writeScd4's TWO commit windows: history appends first, current merges
  * second, and the (appId, batchId) txn rides on both — a crash in
  * either window followed by redelivery must land the byte-equal
  * no-crash state on BOTH tables (the reference's Delta txn semantics,
  * re-derived over the COW commit log). */
class Scd4PropertySpec extends SparkSpec {
  import spark.implicits._

  private def ts(i: Int) = new java.sql.Timestamp(i * 1000L)

  // one update per key per batch (the writers' dedup contract);
  // ~1 in 4 updates is a tombstone (row_active = false)
  private val genBatch: Gen[List[Scd4PropRow]] = for {
    n <- Gen.choose(0, 6)
    rows <- Gen.listOfN(n, Gen.zip(Gen.choose(0, 6), Gen.choose(0, 4),
      Gen.frequency(3 -> true, 1 -> false)))
  } yield rows.groupBy(_._1).values.map(_.head).toList
    .map { case (k, v, act) =>
      Scd4PropRow(k, v, act, deleted_flag = false, ts(0)) }

  private val genScenario: Gen[List[List[Scd4PropRow]]] = for {
    b1 <- genBatch; b2 <- genBatch; b3 <- genBatch; b4 <- genBatch
  } yield List(b1, b2, b3, b4).zipWithIndex
    .map { case (b, i) => b.map(_.copy(updated_at = ts(i + 1))) }

  private case class MRow(v: Int, active: Boolean, deleted: Boolean, t: Int)

  /** Driver model: (current state, history snapshots with stamp). */
  private def modelApply(state: Map[Int, MRow],
                         hist: Vector[(Int, MRow, Int)],
                         batch: List[Scd4PropRow], day: Int)
      : (Map[Int, MRow], Vector[(Int, MRow, Int)]) =
    batch.foldLeft((state, hist)) { case ((s, h), u) =>
      if (!u.row_active) {
        // tombstone: flips ONLY deleted_flag on a matched row; unknown
        // keys drop; history never snapshots a tombstone match
        s.get(u.k) match {
          case Some(cur) => (s.updated(u.k, cur.copy(deleted = true)), h)
          case None => (s, h)
        }
      } else s.get(u.k) match {
        case Some(cur) => // pre-merge snapshot to history, then UpdateAll
          (s.updated(u.k, MRow(u.v, active = true, deleted = false, day)),
            h :+ ((u.k, cur, day)))
        case None =>
          (s.updated(u.k, MRow(u.v, active = true, deleted = false, day)), h)
      }
    }

  private def tsDay(t: java.sql.Timestamp): Int = (t.getTime / 1000L).toInt

  test("scd4Apply matches the current+history model on random sequences") {
    val prop = Prop.forAll(genScenario) { batches =>
      var current = Seq.empty[Scd4PropRow].toDF()
      var history: Option[org.apache.spark.sql.DataFrame] = None
      batches.foreach { batch =>
        if (batch.nonEmpty) {
          val (nc, hr) = Scd.scd4Apply(current, batch.toDF(), Seq("k"))
          current = nc.localCheckpoint()
          history = Some(history.map(_.unionByName(hr)).getOrElse(hr)
            .localCheckpoint())
        }
      }
      val (ms, mh) = batches.zipWithIndex.foldLeft(
        (Map.empty[Int, MRow], Vector.empty[(Int, MRow, Int)])) {
        case ((s, h), (b, i)) => modelApply(s, h, b, i + 1)
      }
      val gotCur = current.collect().map(r => r.getInt(0) ->
        MRow(r.getInt(1), r.getBoolean(2) || !r.getBoolean(3),
          r.getBoolean(3), tsDay(r.getTimestamp(4)))).toMap
      // model "active" is derived: a tombstoned row keeps target's old
      // row_active (UpdateExpr touches only deleted_flag) — compare on
      // (v, deleted, ts) which the model tracks exactly
      val curOk = gotCur.keySet == ms.keySet && ms.forall { case (k, m) =>
        val g = gotCur(k); g.v == m.v && g.deleted == m.deleted && g.t == m.t
      }
      val gotHist = history.map(_.collect().map(r => (r.getInt(0),
          r.getInt(1), r.getBoolean(3), tsDay(r.getTimestamp(5))))
          .groupBy(identity).view.mapValues(_.length).toMap)
        .getOrElse(Map.empty)
      val wantHist = mh.map { case (k, m, day) => (k, m.v, m.deleted, day) }
        .groupBy(identity).view.mapValues(_.length).toMap
      val histOk = gotHist == wantHist
      if (!(curOk && histOk))
        println(s"batches=$batches\ngotCur=$gotCur\nmodelCur=$ms\n" +
          s"gotHist=$gotHist\nwantHist=$wantHist")
      curOk && histOk
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("writeScd4: a crash in EITHER table's commit window replays cleanly") {
    def applyAll(prefix: String, batches: List[List[Scd4PropRow]],
                 crashAt: Option[(Int, Boolean)]) // (batch, onHistory?)
        : (Set[Seq[Any]], Map[Seq[Any], Int]) = {
      val curRoot = tmpDir(s"${prefix}_cur")
      val histRoot = tmpDir(s"${prefix}_hist")
      var cur = new ParquetTable(spark, curRoot)
      var hist = new ParquetTable(spark, histRoot)
      def write(b: List[Scd4PropRow], i: Int): Unit =
        Scd.writeScd4(cur, hist, b.toDF(), Seq("k"),
          txn = Some(("scd4prop", i.toLong)))
      batches.zipWithIndex.foreach { case (b, i) =>
        if (b.nonEmpty) {
          if (crashAt.contains((i, true)))
            hist.onPreCommit = () => throw new RuntimeException("boom-h")
          if (crashAt.contains((i, false)))
            cur.onPreCommit = () => throw new RuntimeException("boom-c")
          if (crashAt.exists(_._1 == i)) {
            // the hook may legitimately not fire (e.g. a bootstrap batch
            // never touches the history table) — redeliver only on crash
            val attempt = scala.util.Try(write(b, i))
            cur = new ParquetTable(spark, curRoot) // restart both handles
            hist = new ParquetTable(spark, histRoot)
            if (attempt.isFailure) write(b, i) // redelivery, same txn
          } else write(b, i)
        }
      }
      (if (cur.exists) rowsOf(cur.read) else Set.empty,
        if (hist.exists) hist.read.collect().map(_.toSeq).toSeq
          .groupBy(identity).view.mapValues(_.length).toMap
        else Map.empty)
    }
    val prop = Prop.forAll(genScenario, Gen.choose(0, 3),
      Gen.oneOf(true, false)) { (batches, crashIdx, onHistory) =>
      val clean = applyAll("scd4p_clean", batches, None)
      val crashed = applyAll("scd4p_crash", batches,
        Some((crashIdx, onHistory)))
      if (clean != crashed)
        println(s"crashIdx=$crashIdx onHistory=$onHistory " +
          s"batches=$batches\nclean=$clean\ncrashed=$crashed")
      clean == crashed
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }
}
