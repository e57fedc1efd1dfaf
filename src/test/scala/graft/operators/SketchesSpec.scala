package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("hllDistinct estimates within HLL error bounds and is deterministic") {
    // three groups with very different cardinalities: 10 (small-range
    // correction territory), 500, 5000 (raw harmonic estimate)
    val rows = (1 to 10).map(i => ("tiny", s"v$i")) ++
      (1 to 500).map(i => ("mid", s"v$i")) ++
      (1 to 5000).map(i => ("big", s"v$i"))
    val df = rows.toDF("grp", "v")
    val out = Sketches.hllDistinct(df, "v", Seq("grp")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out("tiny")._1 == 10L)
    assert(out("mid")._1 == 500L)
    assert(out("big")._1 == 5000L)
    // m=256 -> standard error ~1.04/sqrt(256) = 6.5%; allow 3 sigma
    out.foreach { case (g, (exact, est)) =>
      assert(math.abs(est - exact) / exact < 0.20, s"$g: est $est vs exact $exact")
    }
    // linear-counting regime should be very tight for tiny cardinalities
    assert(math.abs(out("tiny")._2 - 10.0) / 10.0 < 0.05)
    // deterministic: identical on re-run
    val again = Sketches.hllDistinct(df, "v", Seq("grp")).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    out.foreach { case (g, (_, est)) => assert(again(g) == est) }
  }

  test("hllDistinct ignores nulls (countDistinct semantics), no null-poisoning") {
    val df = ((1 to 100).map(i => ("g", s"v$i")) :+ (("g", null: String)))
      .toDF("grp", "v")
    val r = Sketches.hllDistinct(df, "v", Seq("grp")).collect()(0)
    assert(r.getLong(1) == 100L) // exact ignores the null
    assert(!r.isNullAt(2) && math.abs(r.getDouble(2) - 100) / 100.0 < 0.25)
  }

  test("hllDistinct register state is bounded at m rows per group") {
    val df = (1 to 5000).map(i => ("g", s"v$i")).toDF("grp", "v")
    // the intermediate register relation can never exceed m rows per group —
    // probe it through the public API by checking the estimate survives m
    // much smaller than the cardinality
    val est = Sketches.hllDistinct(df, "v", Seq("grp"), m = 64)
      .collect()(0).getDouble(2)
    assert(math.abs(est - 5000) / 5000.0 < 0.5) // m=64 -> ~13% stderr, 3+ sigma
    intercept[IllegalArgumentException] {
      Sketches.hllDistinct(df, "v", Seq("grp"), m = 100) // not a power of two
    }
  }

  test("cmsEstimate: one-sided error, exact when the grid is collision-free") {
    import spark.implicits._
    val rows = (Seq.fill(50)("hot") ++ (1 to 30).map(i => s"k$i")).toDF("k")
    // wide grid, 31 distinct keys: collisions are overwhelmingly unlikely,
    // so the estimate IS the exact count
    val wide = Sketches.cmsEstimate(rows, "k", width = 65536, depth = 3,
        probeKeys = Seq("hot", "k1", "k2")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(wide("hot") == ((50L, 50L, 0L)))
    assert(wide("k1") == ((1L, 1L, 0L)))
    // a 2-wide grid forces collisions: the estimate NEVER undercounts
    val narrow = Sketches.cmsEstimate(rows, "k", width = 2, depth = 2,
      probeKeys = Seq("hot", "k1"))
    assert(narrow.collect().forall(r => r.getLong(3) >= 0L))
    // absent probe key still reports (collisions may inflate it; exact = 0)
    val absent = Sketches.cmsEstimate(rows, "k", width = 2, depth = 2,
      probeKeys = Seq("nope")).collect()
    assert(absent.length == 1 && absent.head.getLong(1) == 0L)
  }

  test("topNgrams matches the sort-based ranking and stays off the Window path") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Sketches.topNgrams(docs, "text", n = 3, topK = 15)
    // reference: full count + global sort
    val grams = docs.select(explode(
      graft.functions.TextHashFunctions.shingles(col("text"), 3)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).cast("long").as("n_occ"))
      .orderBy(col("n_occ").desc, col("gram").asc).limit(15)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val got = out.orderBy("rank").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == grams.toSeq)
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("partial_topk_agg"), p)
  }

  test("hllMergedDistinct: the merged estimate is grouping-invariant (max-of-max identity)") {
    import org.apache.spark.sql.functions._
    val rows = (1L to 2000L).map(i => (i % 700, s"g${i % 3}", s"h${i % 7}"))
      .toDF("v", "ga", "gb")
    def est(groupCols: Seq[String]) =
      Sketches.hllMergedDistinct(rows, "v", groupCols).collect()(0)
    val a = est(Seq("ga"))
    val b = est(Seq("gb"))
    // merging 3 sketches and merging 7 sketches of the SAME values must
    // land on the identical union sketch -> identical estimate
    assert(a.getDouble(2) == b.getDouble(2))
    assert(a.getLong(0) == 3L && b.getLong(0) == 7L)
    assert(a.getLong(1) == 700L)
    // and both equal the direct single-group sketch of the whole input
    val direct = Sketches.hllDistinct(rows.withColumn("one", lit("x")),
      "v", Seq("one")).collect()(0)
    assert(direct.getDouble(2) == a.getDouble(2))
  }

  test("cmsJoinSizeEstimate: exact when collision-free, one-sided when narrow") {
    import spark.implicits._
    // left: key 1 x3, key 2 x2; right: key 1 x2, key 3 x4
    // exact join rows = 3*2 = 6
    val l = Seq(1L, 1L, 1L, 2L, 2L).toDF("k")
    val r = Seq(1L, 1L, 3L, 3L, 3L, 3L).toDF("k")
    val wide = Sketches.cmsJoinSizeEstimate(l, "k", r, "k",
      width = 65536, depth = 3).collect()(0)
    assert(wide.getLong(0) == 6L && wide.getLong(1) == 6L &&
      wide.getLong(2) == 0L)
    // width 1: everything collides -> estimate = |L|*|R| = 30, never under
    val narrow = Sketches.cmsJoinSizeEstimate(l, "k", r, "k",
      width = 1, depth = 2).collect()(0)
    assert(narrow.getLong(0) == 6L && narrow.getLong(1) == 30L)
    assert(narrow.getLong(2) >= 0L)
  }

  test("cmsJoinSizeEstimate under adversarial skew: one hot key at 10% of both sides") {
    import spark.implicits._
    // The configuration a real pre-flight consults: a hot key holding 10%
    // of BOTH sides (the join-blowup case the estimator exists to catch),
    // long tails of singleton keys, width sized by the rule
    // width ≳ |A|·|B| / (ε · true_join) for relative error ε.
    val hot = Seq.fill(200)(1L)
    val l = (hot ++ (2L to 1801L)).toDF("k")          // 2000 rows
    val r = (hot ++ (1000L to 2799L)).toDF("k")       // 2000 rows
    // exact: hot 200·200 + singleton overlap keys 1000..1801 (802 keys)
    val exactExpected = 200L * 200L + 802L
    val out = Sketches.cmsJoinSizeEstimate(l, "k", r, "k",
      width = 4096, depth = 5).collect()(0)
    val (exact, est, over) = (out.getLong(0), out.getLong(1), out.getLong(2))
    assert(exact == exactExpected)
    // one-sided: the estimate never understates the blowup
    assert(over >= 0L)
    // and the hot key's mass doesn't poison the error term: expected
    // overshoot per depth row is ≤ |A|·|B|/width ≈ 977 (2.4% of exact
    // here); the min over 5 rows must stay within a few multiples of it
    assert(over <= 3L * (2000L * 2000L / 4096L),
      s"overcount $over vs AMS bound ${2000L * 2000L / 4096L}")
    // the decision the pre-flight exists for: est flags ~40k output rows
    // from 2k x 2k inputs (10x amplification), not a harmless join
    assert(est >= exactExpected && est.toDouble / exact < 1.1)
  }

  test("hllKeyOverlap: identical sides collapse to one sketch; disjoint sides clamp at 0") {
    import spark.implicits._
    val a = (1L to 400L).toDF("k")
    // identical key sets: all three sketches are THE SAME register table,
    // so est_overlap == est_left == est_right == est_union exactly
    val same = Sketches.hllKeyOverlap(a, "k", a.orderBy(rand(7)), "k").collect()(0)
    assert(same.getLong(0) == 400L)
    assert(same.getDouble(1) == same.getDouble(2))
    assert(same.getDouble(1) == same.getDouble(3))
    assert(same.getDouble(4) == same.getDouble(1))
    // half-overlap: 200 shared keys; the estimate lands within HLL error
    // (m=256 -> ~6.5% relative) of truth, scaled by the union's size
    val b = (201L to 600L).toDF("k")
    val half = Sketches.hllKeyOverlap(a, "k", b, "k").collect()(0)
    assert(half.getLong(0) == 200L)
    assert(math.abs(half.getDouble(4) - 200.0) < 80.0,
      s"overlap estimate ${half.getDouble(4)} too far from 200")
    // disjoint: inclusion-exclusion noise must clamp at 0, never negative
    val c = (10001L to 10400L).toDF("k")
    val disj = Sketches.hllKeyOverlap(a, "k", c, "k").collect()(0)
    assert(disj.getLong(0) == 0L)
    assert(disj.getDouble(4) >= 0.0)
    // multiplicities don't matter: distinct-key semantics
    val dup = Sketches.hllKeyOverlap(
      a.union(a).union(a), "k", a, "k").collect()(0)
    assert(dup.getLong(0) == 400L && dup.getDouble(1) == same.getDouble(1))
  }

  test("hllMergedDistinct: multi-column groups count as tuples, not concatenations") {
    // regression: concat-based counting merged ("a","bc") with ("ab","c")
    val rows = Seq((1L, "a", "bc"), (2L, "ab", "c"), (3L, "a", "bc"))
      .toDF("v", "ga", "gb")
    val out = Sketches.hllMergedDistinct(rows, "v", Seq("ga", "gb")).collect()(0)
    assert(out.getLong(0) == 2L, s"expected 2 distinct group tuples, got $out")
  }

  test("joinPreflightCard: every strategy branch fires at its threshold") {
    import spark.implicits._
    def card(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame,
             bc: Long, skew: Double) =
      Sketches.joinPreflightCard(l, "k", r, "k",
        broadcastRowLimit = bc, skewShareLimit = skew).collect()(0)
    val flat = (1 to 100).map(i => i.toLong).toDF("k")      // uniform keys
    val hot = ((1 to 80).map(_ => 7L) ++ (1 to 20).map(i => 100L + i))
      .toDF("k")                                            // one key at 80%
    // small right side -> broadcast_right wins before any other rule
    val br = card(flat, (1 to 5).map(_.toLong).toDF("k"), bc = 10, skew = 0.1)
    assert(br.getString(6) == "broadcast_right", br.toString)
    assert(br.getLong(0) == 100L && br.getLong(2) == 5L)
    // small LEFT side (right too big to broadcast) -> broadcast_left
    val bl = card((1 to 5).map(_.toLong).toDF("k"), flat, bc = 10, skew = 0.1)
    assert(bl.getString(6) == "broadcast_left", bl.toString)
    // no broadcast fit, hot key share 0.8 > 0.1 -> salt
    val sa = card(hot, flat, bc = 10, skew = 0.1)
    assert(sa.getString(6) == "salt", sa.toString)
    assert(sa.getDouble(1) == 0.8)
    // uniform both sides, no broadcast fit -> shuffle_hash
    val shf = card(flat, flat, bc = 10, skew = 0.1)
    assert(shf.getString(6) == "shuffle_hash", shf.toString)
    // the card's estimates stay sane on the uniform self-join: every key
    // matches itself once, so the CMS estimate >= the exact 100 and the
    // HLL overlap lands near 100
    assert(shf.getLong(4) >= 100L)
    assert(math.abs(shf.getDouble(5) - 100.0) < 25.0)
  }

  test("hllRollingDistinct: window merge equals the direct union sketch") {
    import spark.implicits._
    def ts(d: Int, i: Int) = java.sql.Timestamp.valueOf(f"2024-05-$d%02d 0${i % 9}:0${i / 9}:00")
    // day 1: users 1-40, day 2: 21-60 (overlap 20), day 9: 100-130
    val rows = (1 to 40).map(u => (ts(1, u % 60), u.toLong)) ++
      (21 to 60).map(u => (ts(2, u % 60), u.toLong)) ++
      (100 to 130).map(u => (ts(9, u % 60), u.toLong))
    val df = rows.toDF("ts", "user_id")
    val out = Sketches.hllRollingDistinct(df, "ts", "user_id", windowDays = 3)
      .collect().map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // exact rolling counts and contributing-day counts
    assert(out("2024-05-01")._1 == 1L && out("2024-05-01")._2 == 40L)
    assert(out("2024-05-02")._1 == 2L)
    assert(out("2024-05-02")._2 == 60L)
    assert(out("2024-05-09")._2 == 31L)
    // the MERGE identity: the 2-day window's estimate must equal the
    // direct sketch of the union of those days' values (max of per-day
    // register maxima == the union's register maxima, by construction)
    val direct = Sketches.hllDistinct(
        df.filter(col("ts") < ts(3, 0)).withColumn("g", lit("x")),
        "user_id", Seq("g")).head().getDouble(2)
    assert(out("2024-05-02")._3 == direct)
    // estimates land near exact at these cardinalities (small-range mode)
    assert(math.abs(out("2024-05-02")._3 - 60.0) < 10.0)
  }

  test("kmvOverlap: unsaturated sketches are exact sets; estimates track truth when saturated") {
    import spark.implicits._
    // A = 1..60, B = 31..90: |A|=|B|=60, union 90, inter 30, J=1/3.
    // k=16 saturates everything; k=256 holds the full sets -> exact.
    val rows = ((1 to 60).map(i => ("A", i.toLong)) ++
      (31 to 90).map(i => ("B", i.toLong))).toDF("g", "v")
    val exact = Sketches.kmvOverlap(rows, "v", "g", k = 256).collect().head
    assert(exact.getDouble(2) == 60.0 && exact.getDouble(3) == 60.0)
    assert(exact.getDouble(4) == 90.0, "unsaturated union is the exact set")
    assert(math.abs(exact.getDouble(5) - math.rint(1e4 * 30.0 / 90.0) / 1e4) < 1e-9)
    assert(exact.getDouble(6) == 30.0)
    val est = Sketches.kmvOverlap(rows, "v", "g", k = 16).collect().head
    // ~1/sqrt(16) = 25% relative error band, doubled for slack
    assert(math.abs(est.getDouble(4) - 90.0) / 90.0 < 0.5, s"union ${est.getDouble(4)}")
    assert(est.getDouble(5) >= 0.0 && est.getDouble(5) <= 1.0)
    // duplicates must not shift the sketch (set semantics)
    val dup = Sketches.kmvOverlap(rows.union(rows), "v", "g", k = 16).collect().head
    assert(dup.getDouble(4) == est.getDouble(4) && dup.getDouble(6) == est.getDouble(6))
  }

  test("kmvOverlap: disjoint sets report zero intersection; identical sets J=1") {
    import spark.implicits._
    val rows = ((1 to 40).map(i => ("L", i.toLong)) ++
      (1001 to 1040).map(i => ("R", i.toLong)) ++
      (1 to 40).map(i => ("S", i.toLong))).toDF("g", "v")
    // k = 64 > 40: the per-side sketches hold their whole sets (exact);
    // the disjoint L∪R (80 values) still saturates the combined sketch
    val out = Sketches.kmvOverlap(rows, "v", "g", k = 64)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val lr = out(("L", "R"))
    assert(lr.getDouble(5) == 0.0 && lr.getDouble(6) == 0.0)
    val ls = out(("L", "S"))
    assert(ls.getDouble(5) == 1.0, "identical sets must estimate J=1")
    assert(ls.getDouble(4) == 40.0 && ls.getDouble(6) == 40.0)
  }

  test("topKChurn: entered/dropped/steady with rank movement") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(("x x x y", false), ("y y z", true)).toDF("text", "pb")
    val out = Sketches.topKChurn(docs, "text", col("pb"), n = 1, topK = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("x", "y", "z"))
    assert(out("x").getString(5) == "dropped" && out("x").getLong(2) == 1L)
    val y = out("y")
    assert(y.getString(5) == "steady" && y.getLong(2) == 2L &&
      y.getLong(4) == 1L && y.getLong(6) == 1L,
      "y climbs from rank 2 to rank 1: move +1")
    assert(out("z").getString(5) == "entered" && out("z").getLong(4) == 2L)
  }
}
