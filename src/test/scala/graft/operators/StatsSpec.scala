package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, lit}

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("groupQuantiles selects the value at ordered rank ceil(p*n)") {
    // group a: 1..100 -> p50 = v[50] = 50, p90 = v[90] = 90, p99 = v[99] = 99
    // group b: ten copies of 7 and one 9 (duplicates; n=11)
    val rows = (1 to 100).map(i => ("a", i.toDouble)) ++
      (1 to 10).map(_ => ("b", 7.0)) :+ (("b", 9.0))
    val out = Stats.groupQuantiles(rows.toDF("k", "v"), "k", "v", Seq(0.5, 0.9, 0.99))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out("a") == ((100L, 50.0, 90.0, 99.0)))
    // b: n=11; ceil(.5*11)=6 -> 7.0; ceil(.9*11)=10 -> 7.0; ceil(.99*11)=11 -> 9.0
    assert(out("b") == ((11L, 7.0, 7.0, 9.0)))
  }

  test("histogramBuckets: equal-frequency bins, ties stay together, no global window over rows") {
    val rows = (1 to 100).map(i => (i.toLong, (i % 20).toDouble)) // 20 distinct values x5
    val out = Stats.histogramBuckets(rows.toDF("id", "v"), "v", nBuckets = 10)
    val byBucket = out.groupBy("bucket").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byBucket.keys.toSet == (0L to 9L).toSet)
    assert(byBucket.values.forall(_ == 10L)) // 100 rows / 10 buckets
    // every (value -> bucket) mapping is functional: ties share a bucket
    val vb = out.select("v", "bucket").distinct().collect()
    assert(vb.length == 20)
    // bucket is monotone in the value
    val sorted = vb.map(r => (r.getDouble(0), r.getLong(1))).sortBy(_._1)
    assert(sorted.map(_._2).toSeq == sorted.map(_._2).sorted.toSeq)
  }

  test("histogramBuckets: continuous column (grid = rows) plans no unpartitioned window") {
    // every value distinct — the value grid IS the row count, the case
    // where the old grid-wide cumulative window became a single-partition
    // global sort. The range-partitioned two-pass must plan only
    // partitioned windows and still bucket exactly.
    val rows = (1 to 200).map(i => (i.toLong, i * 0.37)).toDF("id", "v")
    val out = Stats.histogramBuckets(rows, "v", nBuckets = 10, nRanges = 8)
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val globals = out.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }
    assert(globals.isEmpty,
      s"histogramBuckets planned an unpartitioned Window:\n$globals")
    val byBucket = out.groupBy("bucket").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byBucket.keys.toSet == (0L to 9L).toSet)
    assert(byBucket.values.forall(_ == 20L)) // 200 distinct rows / 10 buckets
  }

  test("histogramBuckets: a dominant value occupies its bucket without splitting") {
    val rows = (1 to 80).map(i => (i.toLong, 1.0)) ++ (81 to 100).map(i => (i.toLong, 2.0))
    val out = Stats.histogramBuckets(rows.toDF("id", "v"), "v", nBuckets = 10)
      .select("v", "bucket").distinct().collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(out(1.0) == 0L) // first occurrence rank 0
    assert(out(2.0) == 8L) // starts at rank 80 -> bucket 8
  }

  test("sequenceGaps finds maximal missing-id runs, ignoring dups and nulls") {
    val rows = Seq[java.lang.Long](1L, 2L, 2L, 5L, 9L, null).toDF("id")
    val out = Stats.sequenceGaps(rows, "id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((3L, 4L, 2L), (6L, 8L, 3L)))
    // dense sequence -> no gaps
    assert(Stats.sequenceGaps((1L to 10L).toDF("id"), "id").count() == 0)
    // empty input -> empty output, not a crash on the bounds collect
    assert(Stats.sequenceGaps(Seq.empty[Long].toDF("id"), "id").count() == 0)
  }

  test("sequenceGaps stitches gaps across range-bucket boundaries") {
    // ids spread over [0, 1000] with holes of every flavor: intra-bucket,
    // spanning one boundary, spanning SEVERAL whole (empty) buckets
    val ids = Seq(0L, 1L, 7L, 8L, 120L, 121L, 122L, 965L, 1000L)
    val expected = {
      val s = ids.sorted
      s.zip(s.tail).collect { case (a, b) if b - a > 1 =>
        (a + 1, b - 1, b - a - 1)
      }.toSet
    }
    // the answer must be identical for ANY bucketing, including nRanges=1
    // (degenerates to the single global sort) and nRanges >> span
    for (r <- Seq(1, 2, 8, 64, 5000)) {
      val out = Stats.sequenceGaps(ids.toDF("id"), "id", nRanges = r).collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
      assert(out == expected, s"nRanges=$r")
    }
  }

  test("sequenceGaps is partition-invariant and handles negative ids") {
    val ids = Seq(-10L, -9L, -3L, 4L, 5L)
    val expected = Set((-8L, -4L, 5L), (-2L, 3L, 6L))
    val a = Stats.sequenceGaps(ids.toDF("id"), "id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    val b = Stats.sequenceGaps(ids.toDF("id").repartition(7), "id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(a == expected && b == expected)
  }

  test("columnProfile: one row per column with nulls/distinct/min/max") {
    val rows = Seq((1L, Some(2.5), "x"), (2L, None, "y"), (3L, Some(2.5), "y"))
      .toDF("id", "v", "s")
    val out = Stats.columnProfile(rows, Seq("id", "v", "s")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    assert(out("id") == ((3L, 0L, 3L, "1", "3")))
    assert(out("v") == ((3L, 1L, 1L, "2.5", "2.5"))) // nulls excluded from distinct
    assert(out("s") == ((3L, 0L, 2L, "x", "y")))
  }

  test("keySkewProfile ranks heavy keys with share and x-mean multiple") {
    // one hot key with 80 rows + 20 singleton keys: n_rows=100, n_keys=21
    val rows = (1 to 80).map(_ => "hot") ++ (1 to 20).map(i => s"k$i")
    val out = Stats.keySkewProfile(rows.toDF("k"), "k", topK = 3).collect()
    assert(out.length == 3)
    val top = out.find(_.getLong(0) == 1L).get
    assert(top.getString(1) == "hot")
    assert(top.getLong(2) == 80L)
    assert(top.getDouble(3) == 0.8) // share of all rows
    assert(top.getDouble(4) == 16.8) // 80 / (100/21 rows-per-mean-key)
    // ties (all cnt=1) break on the key string ascending
    assert(out.find(_.getLong(0) == 2L).get.getString(1) == "k1")
    assert(out.find(_.getLong(0) == 3L).get.getString(1) == "k10")
  }

  test("keySkewProfile excludes null keys and is partition-invariant") {
    val rows = Seq(Some("a"), Some("a"), None, Some("b")).toDF("k")
    val a = Stats.keySkewProfile(rows, "k", topK = 2).collect()
    val b = Stats.keySkewProfile(rows.repartition(5), "k", topK = 2).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.map(_.getString(1)).toSet == Set("a", "b")) // null key dropped
  }

  test("madOutliers flags by modified z-score; constant groups have none") {
    // group a: median = rank-floor(0.5*5) element = 5; residuals
    // {4,1,0,1,4,995} -> MAD 1.0; 0.6745*|x-5| > 3.5 only for the 1000
    val rows = Seq(("a", 1.0), ("a", 4.0), ("a", 5.0), ("a", 6.0), ("a", 9.0),
      ("a", 1000.0)) ++ (1 to 5).map(_ => ("b", 42.0))
    val out = Stats.madOutliers(rows.toDF("k", "v"), "k", "v").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    assert(out("a")._1 == 6L && out("a")._4 == 1L)
    assert(out("a")._2 == 5.0)
    // constant group: MAD 0, multiply form -> zero outliers, no div-by-zero
    assert(out("b") == ((5L, 42.0, 0.0, 0L)))
  }

  test("groupQuantiles is deterministic under duplicate values") {
    val rows = (1 to 1000).map(i => ("g", (i % 10).toDouble))
    val a = Stats.groupQuantiles(rows.toDF("k", "v"), "k", "v", Seq(0.5)).collect()(0)
    val b = Stats.groupQuantiles(rows.toDF("k", "v").repartition(7), "k", "v",
      Seq(0.5)).collect()(0)
    assert(a.getDouble(2) == b.getDouble(2)) // rank-k value is partition-invariant
  }

  test("psiReport: identical distributions -> psi 0; a shift -> positive psi") {
    val ref = (1 to 1000).map(i => (i % 100).toDouble).toDF("v")
    val same = Stats.psiReport(ref, ref, "v", nBins = 10).collect()
    assert(same.length == 10)
    same.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2)) // shares equal bin-by-bin
      assert(r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0)
    }
    assert(math.abs(same.map(_.getDouble(1)).sum - 1.0) < 1e-9)

    // current mass concentrated in the top decile: large positive psi there
    val cur = (1 to 1000).map(i => 90.0 + (i % 10)).toDF("v")
    val drift = Stats.psiReport(ref, cur, "v", nBins = 10).collect()
    val total = drift.head.getDouble(4)
    assert(total > 0.25, s"psi_total $total") // well past the alert line
    // out-of-range current values clamp into edge bins, never vanish
    val below = (1 to 100).map(_ => -50.0).toDF("v")
    val clamped = Stats.psiReport(ref, below, "v", nBins = 10).collect()
    assert(clamped.find(_.getLong(0) == 0L).get.getDouble(2) == 1.0)
  }

  test("groupRegression recovers an exact line; constant-x groups go null") {
    // group a: y = 2x + 1 exactly -> slope 2, intercept 1, r2 1
    val a = (1 to 50).map(i => ("a", i.toDouble, 2.0 * i + 1))
    // group b: x constant -> sxx = 0 -> null fit
    val b = (1 to 10).map(i => ("b", 5.0, i.toDouble))
    val out = Stats.groupRegression((a ++ b).toDF("k", "x", "y"), "k", "x", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    val ra = out("a")
    assert(ra.getLong(1) == 50L && ra.getDouble(2) == 2.0 &&
      ra.getDouble(3) == 1.0 && ra.getDouble(4) == 1.0)
    val rb = out("b")
    assert(rb.getLong(1) == 10L && rb.isNullAt(2) && rb.isNullAt(3) &&
      rb.isNullAt(4))
  }

  test("winsorizedStats: clamped mean moves toward the body, tails counted") {
    // group a: 98 values of 10 plus outliers 0 and 1000
    // n=100: lo = v[ceil(.05*100)=5] = 10, hi = v[95] = 10
    val rows = Seq(("a", 0.0), ("a", 1000.0)) ++
      (1 to 98).map(_ => ("a", 10.0))
    val out = Stats.winsorizedStats(rows.toDF("k", "v"), "k", "v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4),
          r.getLong(5)))).toMap
    // raw mean = (0 + 1000 + 980)/100 = 19.8; winsorized: all clamp to 10
    assert(out("a") == ((100L, 19.8, 10.0, 1L, 1L)))
  }

  test("globalRank equals the naive global window, including cross-range ties") {
    // values deliberately collide (i % 7) so tie groups straddle range
    // boundaries; id breaks ties
    val rows = (1 to 500).map(i => (i.toLong, (i % 7).toDouble))
    val df = rows.toDF("id", "v")
    val out = Stats.globalRank(df, "v", "id", nRanges = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val expect = rows.sortBy { case (id, v) => (v, id) }
      .zipWithIndex.map { case ((id, v), i) => (id, v, i + 1L) }
    assert(out.sortBy(_._3).toSeq == expect)
    // more ranges than rows degrades gracefully
    val tiny = Stats.globalRank((1 to 3).map(i => (i.toLong, i.toDouble))
      .toDF("id", "v"), "v", "id", nRanges = 64)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._2)
    assert(tiny.toSeq == Seq((1L, 1L), (2L, 2L), (3L, 3L)))
  }

  test("ksBinnedDrift: identical distributions score 0, disjoint ones score 1") {
    val same = (1 to 50).flatMap(i =>
      Seq(("a", i.toDouble), ("b", i.toDouble)))
    val ks0 = Stats.ksBinnedDrift(same.toDF("g", "v"), "g", "v", nBins = 10)
      .collect()
    assert(ks0.length == 1)
    assert(ks0(0).getDouble(2) == 0.0, "identical groups must have KS 0")
    // a occupies [1,50], c occupies [1001,1050]: CDFs never overlap -> KS 1,
    // realized at the last bin a fully occupies
    val far = (1 to 50).map(i => ("a", i.toDouble)) ++
      (1 to 50).map(i => ("c", 1000.0 + i))
    val ks1 = Stats.ksBinnedDrift(far.toDF("g", "v"), "g", "v", nBins = 10)
      .collect()
    assert(ks1.length == 1)
    assert(ks1(0).getDouble(2) == 1.0, "disjoint supports must have KS 1")
    assert(ks1(0).getLong(3) == 0L, "sup realized where a's mass ends")
  }

  test("ksBinnedDrift densifies empty bins: sparse group CDFs stay aligned") {
    // b has mass only in the top bin; without zero-filled cells its CDF rows
    // would be missing for bins 0..8 and the pairwise join would drop them
    val rows = (1 to 90).map(i => ("a", i.toDouble)) ++
      Seq(("b", 90.0), ("b", 89.0))
    val out = Stats.ksBinnedDrift(rows.toDF("g", "v"), "g", "v", nBins = 9)
      .collect()
    assert(out.length == 1)
    // a's CDF at the second-to-last bin is ~8/9ths, b's is 0 -> KS near 0.88
    assert(out(0).getDouble(2) > 0.8 && out(0).getDouble(2) < 1.0)
  }

  test("calibrationReport: per-bin gaps and the n-weighted ECE") {
    // bin 9 (conf .9): 4 rows, 3 positives -> gap |.9 - .75| = .15
    // bin 1 (conf .1): 6 rows, 0 positives -> gap .1
    // ECE = (4*.15 + 6*.1) / 10 = .12
    val rows = Seq.fill(3)((0.9, true)) ++ Seq((0.9, false)) ++
      Seq.fill(6)((0.1, false))
    val out = Stats.calibrationReport(rows.toDF("score", "label"),
      "score", "label", nBins = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    assert(out.keySet == Set(1L, 9L))
    assert(out(9L) == ((4L, 0.9, 0.75, 0.15, 0.12)))
    assert(out(1L) == ((6L, 0.1, 0.0, 0.1, 0.12)))
    // a score of exactly 1.0 lands in the top bin, not bin nBins
    val top = Stats.calibrationReport(Seq((1.0, true)).toDF("s", "l"),
      "s", "l", nBins = 10).collect()
    assert(top.length == 1 && top(0).getLong(0) == 9L)
  }

  test("surrogateKeyAudit: narrow widths collide, keys count is width-invariant") {
    val df = (1 to 500).map(i => s"key_$i").toDF("k")
    val out = Stats.surrogateKeyAudit(df, "k", widths = Seq(4, 30))
      .collect().map(r => r.getLong(0).toInt ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5))).toMap
    // 500 keys into 16 slots: heavy collisions, every slot multi-occupied
    val (n4, h4, c4, mb4) = out(4)
    assert(n4 == 500L && h4 == 16L && c4 == 484L && mb4 >= 32L)
    // 500 keys into 2^30 slots: collisions essentially impossible
    val (n30, h30, c30, _) = out(30)
    assert(n30 == 500L && c30 == n30 - h30 && c30 <= 1L)
    // duplicate natural keys dedup before hashing
    val dup = Stats.surrogateKeyAudit(
      (1 to 100).map(i => s"key_${i % 10}").toDF("k"), "k", Seq(16))
      .collect()
    assert(dup(0).getLong(1) == 10L)
  }

  test("globalRank plans only range-partitioned windows — never a global sort") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = (1 to 100).map(i => (i.toLong, (i % 5).toDouble)).toDF("id", "v")
    val plan = Stats.globalRank(df, "v", "id", nRanges = 8)
      .queryExecution.optimizedPlan
    val wins = plan.collect { case w: LWindow => w }
    assert(wins.nonEmpty, "expected the per-range row_number window")
    assert(wins.forall(_.partitionSpec.nonEmpty),
      s"unpartitioned Window — a single-partition global sort at scale:\n$plan")
  }

  test("cohenKappa matches the textbook worked example") {
    // classic 2x2: 50 items, A/B say yes together 20, no together 15,
    // A-yes/B-no 10, A-no/B-yes 5 -> po=0.7, pe=0.5, kappa=0.4
    val rows = Seq.fill(20)(("y", "y")) ++ Seq.fill(15)(("n", "n")) ++
      Seq.fill(10)(("y", "n")) ++ Seq.fill(5)(("n", "y"))
    val r = Stats.cohenKappa(rows.toDF("a", "b"), "a", "b").head()
    assert(r.getLong(0) == 50L)
    assert(r.getDouble(1) == 0.7)
    assert(r.getDouble(2) == 0.5)
    assert(r.getDouble(3) == 0.4)
  }

  test("cohenKappa edge cases: perfect agreement and degenerate pe = 1") {
    import org.apache.spark.sql.Row
    val perfect = Seq(("x", "x"), ("y", "y"), ("x", "x")).toDF("a", "b")
    assert(Stats.cohenKappa(perfect, "a", "b").head().getDouble(3) == 1.0)
    // both raters constant and equal: pe = 1, kappa undefined -> null
    val const = Seq(("x", "x"), ("x", "x")).toDF("a", "b")
    val r = Stats.cohenKappa(const, "a", "b").head()
    assert(r.getDouble(2) == 1.0 && r.isNullAt(3))
    // disjoint label sets: pe = 0, kappa = po = 0
    val disjoint = Seq(("x", "y"), ("x", "y")).toDF("a", "b")
    val d = Stats.cohenKappa(disjoint, "a", "b").head()
    assert(d.getDouble(1) == 0.0 && d.getDouble(2) == 0.0 && d.getDouble(3) == 0.0)
    // null labels are excluded from n, not counted as disagreement: ten
    // (null,null) rows + two perfect agreements must read kappa = 1 on n=2
    val nullish = (Seq.fill(10)((null: String, null: String)) ++
      Seq(("x", "x"), ("y", "y"))).toDF("a", "b")
    val nr = Stats.cohenKappa(nullish, "a", "b").head()
    assert(nr.getLong(0) == 2L && nr.getDouble(3) == 1.0)
  }

  test("mutualInformation: zero when independent, ln(2) when determined") {
    // independent uniform 2x2: every cell n*n_ab == n_a*n_b -> term 0
    val indep = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q"))
      .toDF("a", "b")
    val ti = Stats.mutualInformation(indep, "a", "b").collect()
    assert(ti.length == 4)
    assert(ti.forall(r => r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0))
    // b fully determined by a, two uniform classes -> MI = ln 2
    val dep = Seq(("x", "p"), ("x", "p"), ("y", "q"), ("y", "q")).toDF("a", "b")
    val td = Stats.mutualInformation(dep, "a", "b").collect()
    assert(td.length == 2)
    assert(td.forall(_.getDouble(4) == 0.693147))
    assert(td.forall(_.getDouble(3) == 0.346574))
  }

  test("quantileNormalize maps each group rank onto the pooled order stats") {
    // pooled sorted: 1,2,3,4,5,6,10,20,30 (N=9)
    // group a (n=3): r=1 -> ceil(9/3)=3 -> 3; r=2 -> 6 -> 6; r=3 -> 9 -> 30
    // group b (n=6): r=1 -> 2 -> 2; r=3 -> ceil(27/6)=5 -> 5; r=6 -> 9 -> 30
    val rows = Seq(("a", 10L), ("a", 20L), ("a", 30L),
        ("b", 1L), ("b", 2L), ("b", 3L), ("b", 4L), ("b", 5L), ("b", 6L))
      .zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }
    val out = Stats.quantileNormalize(
        rows.toDF("id", "g", "v"), "g", "v", "id")
      .collect().map(r => (r.getString(1), r.getLong(3)) -> r.getLong(4)).toMap
    assert(out(("a", 1L)) == 3L && out(("a", 2L)) == 6L && out(("a", 3L)) == 30L)
    assert(out(("b", 1L)) == 2L && out(("b", 3L)) == 5L && out(("b", 6L)) == 30L)
    // every group's top rank maps to the pooled maximum
    assert(out.filterKeys(_._2 == 1L).values.forall(_ <= 3L))
  }

  test("wilsonIntervals: textbook values, asymmetry, and the k=0/k=n edges") {
    val rows = Seq.fill(15)(("a", true)) ++ Seq.fill(5)(("a", false)) ++
      Seq.fill(4)(("zero", false)) ++ Seq.fill(4)(("all", true))
    val out = Stats.wilsonIntervals(rows.toDF("g", "s"), "g", col("s"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    // 15/20 at z=1.96: Wilson interval ~ (0.531, 0.888)
    val a = out("a")
    assert(a._1 == 20L && a._2 == 15L && a._3 == 0.75)
    assert(math.abs(a._4 - 0.531) < 0.002 && math.abs(a._5 - 0.888) < 0.002)
    assert(a._4 > 0.0 && a._5 < 1.0)
    // k = 0: lo exactly 0 is fine, hi must be well above 0 for n = 4
    val z = out("zero")
    assert(z._3 == 0.0 && z._4 == 0.0 && z._5 > 0.4)
    // k = n mirrors it
    val l = out("all")
    assert(l._3 == 1.0 && l._5 == 1.0 && l._4 < 0.6)
  }

  test("liftTable: a perfectly ranking score captures all positives early") {
    // scores 1..100, label = score > 80 (top two deciles are all-positive)
    val rows = (1 to 100).map(i => (i.toDouble, i > 80))
    val out = Stats.liftTable(rows.toDF("s", "y"), "s", col("y"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5)))).toMap
    assert(out.keySet == (1L to 10L).toSet)
    assert(out(1L) == ((10L, 10L, 1.0, 5.0, 0.5)))   // decile 1: all pos, lift 5x
    assert(out(2L) == ((10L, 10L, 1.0, 5.0, 1.0)))   // capture complete by decile 2
    assert(out(3L)._2 == 0L && out(3L)._3 == 0.0)
    assert(out(10L)._5 == 1.0)
    // no positives at all -> null lift/capture, not NaN
    val none = Stats.liftTable(
      (1 to 40).map(i => (i.toDouble, false)).toDF("s", "y"), "s", col("y"))
    assert(none.collect().forall(r => r.isNullAt(4) && r.isNullAt(5)))
  }

  test("chiSquaredIndependence: textbook 2x2, independence, and null exclusion") {
    // 2x2 with margins 30/30 x 30/30: e = 15 everywhere,
    // chi2 = 4 * (10-15)^2/15 = 6.666667; V = sqrt(chi2 / (60 * 1))
    val rows = Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(20)(("b", "x")) ++ Seq.fill(10)(("b", "y"))
    val r = Stats.chiSquaredIndependence(rows.toDF("u", "v"), "u", "v").head()
    assert(r.getLong(0) == 60L && r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(r.getLong(3) == 1L)
    assert(math.abs(r.getDouble(4) - 6.666667) < 1e-5)
    assert(math.abs(r.getDouble(5) - math.sqrt(6.666667 / 60.0)) < 1e-5)
    // perfectly proportional cells -> chi2 exactly 0
    val ind = Seq.fill(6)(("a", "x")) ++ Seq.fill(3)(("a", "y")) ++
      Seq.fill(4)(("b", "x")) ++ Seq.fill(2)(("b", "y"))
    val ri = Stats.chiSquaredIndependence(ind.toDF("u", "v"), "u", "v").head()
    assert(ri.getDouble(4) == 0.0)
    // a single-category margin -> dof 0, V null (not NaN)
    val deg = Seq(("a", "x"), ("a", "y"), ("a", "y"))
    val rd = Stats.chiSquaredIndependence(deg.toDF("u", "v"), "u", "v").head()
    assert(rd.getLong(3) == 0L && rd.isNullAt(5))
    // null categories are excluded from n and margins
    val withNull = rows ++ Seq((null.asInstanceOf[String], "x"), ("a", null))
    val rn = Stats.chiSquaredIndependence(withNull.toDF("u", "v"), "u", "v").head()
    assert(rn.getLong(0) == 60L)
  }

  test("bhAdjust: step-up q-values, tie sharing, and monotone decisions") {
    val df = Seq(("h1", 0.01), ("h2", 0.02), ("h3", 0.03), ("h4", 0.5))
      .toDF("h", "p")
    val out = Stats.bhAdjust(df, "h", "p", alpha = 0.05)
      .collect().map(r => r.getString(0) ->
        ((r.getInt(2), r.getDouble(3), r.getBoolean(4)))).toMap
    // q1 = min(4*.01/1, 4*.02/2, 4*.03/3, .5) = 0.04; ranks ascend with p
    assert(out("h1") == ((1, 0.04, true)))
    assert(out("h2") == ((2, 0.04, true)))
    assert(out("h3") == ((3, 0.04, true)))
    assert(out("h4") == ((4, 0.5, false)))
    // tied p-values share one q regardless of rank order
    val tied = Stats.bhAdjust(
        Seq(("a", 0.02), ("b", 0.02), ("c", 0.9)).toDF("h", "p"), "h", "p")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(tied("a") == tied("b"))
    // q clamps at 1.0 even when m*p/rank overshoots
    val clamp = Stats.bhAdjust(
        Seq(("a", 0.8), ("b", 0.9)).toDF("h", "p"), "h", "p")
      .collect().map(_.getDouble(3))
    assert(clamp.forall(_ <= 1.0))
  }

  test("ratioMetricCI: homogeneous units -> zero SE; unit heterogeneity widens the CI") {
    import spark.implicits._
    // every user identical: 2 events of value 3 -> ratio 3, se 0
    val homo = (1 to 40).flatMap(u => Seq((u.toLong, 3.0), (u.toLong, 3.0)))
      .toDF("u", "v").withColumn("g", lit("m"))
    val h = Stats.ratioMetricCI(homo, "g", "u", col("v"), lit(1.0))
      .collect().head
    assert(h.getLong(1) == 40L && h.getDouble(2) == 3.0)
    assert(h.getDouble(3) == 0.0 && h.getDouble(4) == 3.0 && h.getDouble(5) == 3.0)
    // same OVERALL ratio, heterogeneous users -> positive SE, CI straddles 3
    val hetero = (1 to 40).flatMap(u =>
      Seq((u.toLong, if (u % 2 == 0) 5.0 else 1.0),
        (u.toLong, if (u % 2 == 0) 5.0 else 1.0))).toDF("u", "v")
      .withColumn("g", lit("m"))
    val t = Stats.ratioMetricCI(hetero, "g", "u", col("v"), lit(1.0))
      .collect().head
    assert(t.getDouble(2) == 3.0)
    assert(t.getDouble(3) > 0.2, s"heterogeneity must surface in the SE: $t")
    assert(t.getDouble(4) < 3.0 && t.getDouble(5) > 3.0)
  }

  test("powerAnalysis: closed-form MDE and required n on a known-variance group") {
    import spark.implicits._
    // 100 rows, values 0..9 ten times: mean 4.5, sample var 8.25*100/99
    val df = (1 to 100).map(i => ("g", (i % 10).toDouble)).toDF("k", "v")
    val r = Stats.powerAnalysis(df, "k", "v").collect().head
    val sd = math.sqrt(8.25 * 100 / 99)
    val z = 2.8015852181129683
    assert(r.getLong(1) == 100L)
    assert(r.getDouble(2) == 4.5)
    assert(r.getDouble(3) == math.rint(sd * 1e4) / 1e4)
    val mde = z * sd * math.sqrt(2.0 / 50.0)
    assert(math.abs(r.getDouble(4) - mde) < 1e-3)
    val nReq = math.ceil(2.0 * sd * sd * z * z / math.pow(0.05 * 4.5, 2))
    assert(r.getLong(6).toDouble == nReq)
    // higher variance at the SAME mean -> larger required n
    val wild = (1 to 100).map(i => ("g", (i % 2 * 9).toDouble)).toDF("k", "v")
    assert(Stats.powerAnalysis(wild, "k", "v").collect().head.getLong(6) >
      r.getLong(6))
  }

  test("conformalInterval: exact linear data -> qhat 0, full coverage; alpha monotone") {
    import spark.implicits._
    val df = (1 to 300).map(i => (i.toLong, i.toLong, 2L * i))
      .toDF("id", "x", "y")
    val r = Stats.conformalInterval(df, "id", "x", "y", alpha = 0.1)
      .collect().head
    assert(r.getLong(0) + r.getLong(1) + r.getLong(2) == 300,
      "three splits partition the input")
    assert(r.getDouble(3) == 2.0 && r.getDouble(4) == 0.0, "exact fit")
    assert(r.getDouble(5) == 0.0, "zero residuals -> zero half-width")
    assert(r.getDouble(6) == 1.0 && r.getDouble(7) == 0.9)
    // noise: a tighter alpha can only widen the interval
    val noisy = (1 to 300).map(i => (i.toLong, i.toLong, 2L * i + (i % 7)))
      .toDF("id", "x", "y")
    val q01 = Stats.conformalInterval(noisy, "id", "x", "y", alpha = 0.1)
      .collect().head
    val q05 = Stats.conformalInterval(noisy, "id", "x", "y", alpha = 0.5)
      .collect().head
    assert(q01.getDouble(5) >= q05.getDouble(5))
    assert(q01.getDouble(6) >= 0.8, s"90% interval badly undercovers: $q01")
  }

  test("giniConcentration: 0 for even mass, known value for skew, ~1 for monopoly") {
    import spark.implicits._
    def gini(ws: Seq[Long]): (Long, Long, Double, Double) = {
      val df = ws.zipWithIndex.map { case (w, i) => (s"g$i", w) }.toDF("g", "w")
      val r = Stats.giniConcentration(df, "g", "w").collect().head
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    }
    val even = gini(Seq(10L, 10L, 10L, 10L))
    assert(even == ((4L, 40L, 0.0, 0.25)))
    // {1,2,3,4}: G = 2*(1+4+9+16)/(4*10) - 5/4 = 0.25
    assert(gini(Seq(1L, 2L, 3L, 4L))._3 == 0.25)
    val mono = gini(Seq(0L, 0L, 0L, 100L))
    assert(mono._3 == 0.75 && mono._4 == 1.0) // max G at n=4 is (n-1)/n
  }

  test("weightedQuantiles: crossing rule exact on integer weights; ties collapse") {
    import spark.implicits._
    // values 1,2,3 with weights 1,1,8 (two tied (3,4)+(3,4) rows): W=10.
    // q=0.5 -> threshold 5: cum 1,2,10 -> value 3. q=0.2 -> 2 -> value 2.
    // q=0.1 -> 1 -> value 1. q=1.0 -> 10 -> value 3.
    val df = Seq(("k", 1.0, 1L), ("k", 2.0, 1L), ("k", 3.0, 4L), ("k", 3.0, 4L))
      .toDF("k", "v", "w")
    val out = Stats.weightedQuantiles(df, "k", "v", "w",
        Seq(0.1, 0.2, 0.5, 1.0))
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    assert(out == Map(0.1 -> 1.0, 0.2 -> 2.0, 0.5 -> 3.0, 1.0 -> 3.0))
    // unweighted sanity: uniform weights reduce to plain quantile_disc
    val uni = (1 to 100).map(i => ("u", i.toDouble, 1L)).toDF("k", "v", "w")
    val med = Stats.weightedQuantiles(uni, "k", "v", "w", Seq(0.5))
      .collect().head.getDouble(2)
    assert(med == 50.0)
  }

  test("cupedAdjustment: perfectly correlated pre kills ~all variance; theta pooled") {
    import spark.implicits._
    // post = pre + arm lift, arms share the same pre multiset -> theta = 1
    // exactly (cov(pre, arm) = 0) and adjusted variance 0 in each arm
    val units = (for {
      v <- 0 until 10; arm <- 0 to 1; _ <- 0 until 2
    } yield (arm.toLong, v * 3.0, v * 3.0 + 5.0 * arm))
      .toDF("arm", "pre", "post")
    val out = Stats.cupedAdjustment(units, "arm", "pre", "post")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    assert(out(0L)._1 == 20L && out(1L)._1 == 20L)
    assert(out(0L)._4 == 1.0 && out(1L)._4 == 1.0, "theta must be 1")
    // the arm LIFT survives adjustment (means differ by exactly 5)
    assert(math.abs((out(1L)._3 - out(0L)._3) - 5.0) < 1e-9)
    assert(out(0L)._5 > 0.99 && out(1L)._5 > 0.99,
      s"variance reduction ~1, got ${out(0L)._5} / ${out(1L)._5}")
    // uncorrelated pre must NOT reduce variance (theta ~ 0)
    val noise = (1 to 40).map(i =>
      (i.toLong % 2, (i % 7).toDouble, (i % 5).toDouble))
      .toDF("arm", "pre", "post")
    val nr = Stats.cupedAdjustment(noise, "arm", "pre", "post")
      .collect().map(_.getDouble(5))
    assert(nr.forall(_ < 0.2))
  }

  test("covariateBalance: balanced covariate ~0 SMD, shifted covariate flagged") {
    import spark.implicits._
    // balanced: same values in both arms; skewed: arm B shifted far out
    val df = (1 to 200).map { i =>
      val b = i % 2 == 0
      val v = (((i + 1) / 2) % 10).toDouble
      (b, v, v + (if (b) 20.0 else 0.0))
    }.toDF("arm", "bal", "skew")
    val out = Stats.covariateBalance(df, col("arm"), Seq("bal", "skew"))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(out("bal")._3 == 0.0 && out("bal")._4, "identical arms: SMD 0")
    assert(math.abs(out("skew")._2 - out("skew")._1 - 20.0) < 1e-9)
    assert(math.abs(out("skew")._3) > 1.0 && !out("skew")._4)
  }

  test("covariateBalance: NULL covariate values drop from that covariate's n") {
    import spark.implicits._
    // arm A holds (1, 3) plus two NULLs; arm B holds (2, 4) plus a NULL.
    // With listwise arm counts the NULLs would deflate both means; the
    // per-covariate non-null ns must give the exact means 2 and 3.
    val df = Seq(
      (false, Some(1.0)), (false, Some(3.0)), (false, None), (false, None),
      (true, Some(2.0)), (true, Some(4.0)), (true, None)
    ).toDF("arm", "v")
    val out = Stats.covariateBalance(df, col("arm"), Seq("v"))
      .collect().map(r => (r.getDouble(1), r.getDouble(2))).head
    assert(out == ((2.0, 3.0)),
      s"NULLs must not bias the arm means: got $out, want (2.0, 3.0)")
  }

  test("welchTTest: zero effect gives |t|<eps; known shift gives the textbook t") {
    import spark.implicits._
    // arms share the value multiset (0..9 five times each)
    val same = (1 to 100).map(i => (i % 2 == 0, (((i + 1) / 2) % 10).toDouble))
      .toDF("arm", "v")
    val t0 = Stats.welchTTest(same, col("arm"), "v").collect().head
    assert(t0.getLong(0) == 50L && t0.getLong(1) == 50L)
    assert(math.abs(t0.getDouble(4)) < 1e-9)
    // shift arm B by +1 with per-arm sample var 8.25*50/49 over n=50
    val shifted = (1 to 100).map(i =>
      (i % 2 == 0,
        (((i + 1) / 2) % 10).toDouble + (if (i % 2 == 0) 1.0 else 0.0)))
      .toDF("arm", "v")
    val t1 = Stats.welchTTest(shifted, col("arm"), "v").collect().head
    val expT = 1.0 / math.sqrt(2 * (8.25 * 50 / 49) / 50)
    assert(math.abs(t1.getDouble(4) - math.rint(expT * 1e4) / 1e4) < 1e-9)
    assert(t1.getDouble(5) == 98.0, "equal variances: Welch df = n1+n2-2")
  }

  test("paretoFrontier keeps exactly the undominated points, with counts") {
    import spark.implicits._
    val pts = Seq((1L, 5L, 1L), (2L, 5L, 1L), (3L, 4L, 3L), (4L, 3L, 3L),
      (5L, 4L, 2L), (6L, 2L, 4L), (7L, 3L, 4L)).toDF("id", "x", "y")
    val out = Stats.paretoFrontier(pts, "id", "x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    // (5,1)x2 survives (nothing has x>=5 except itself); (4,3) beats
    // (4,2) and (3,3); the (y=4) plateau keeps only the larger-x (3,4)
    assert(out == Set((5L, 1L, 2L, 1L), (4L, 3L, 1L, 3L),
      (3L, 4L, 1L, 7L)))
  }

  test("poissonBootstrapSE: exact mean, positive SE, partition-invariant") {
    import spark.implicits._
    val df = (1 to 400).map(i => ("g" + (i % 2), i.toLong, (i % 50) * 1.0))
      .toDF("g", "id", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      Stats.poissonBootstrapSE(d, "g", "id", "v", b = 32)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3))).sortBy(_._1)
    val out = run(df)
    assert(out.map(_._2).toSeq == Seq(200L, 200L))
    // the point estimate is the EXACT full-sample mean, not a resample:
    // g0 holds the even residues 0,2,..,48 (mean 24), g1 the odds (25)
    assert(out.map(_._3).toSeq == Seq(24.0, 25.0))
    assert(out.forall(_._4 > 0.0), "bootstrap SE must be positive")
    // hash-derived weights: identical output under any partitioning
    assert(run(df.repartition(13)).toSeq == out.toSeq)
  }

  test("msprt matches the closed-form mixture likelihood ratio") {
    import spark.implicits._
    val df = Seq((false, 1.0), (false, 2.0), (false, 3.0),
      (true, 5.0), (true, 6.0), (true, 7.0)).map { case (a, v) =>
      ("m", a, v)
    }.toDF("metric", "arm", "v")
    val out = Stats.msprt(df, "metric", col("arm"), "v", tau2 = 1.0)
      .collect().head
    // na=nb=3, va=vb=1 -> V=2/3, delta=4:
    // lam = sqrt((2/3)/(5/3)) * exp(16/(2*(2/3)*(5/3)))
    val v = 2.0 / 3.0
    val lam = math.sqrt(v / (v + 1.0)) * math.exp(16.0 / (2.0 * v * (v + 1.0)))
    assert(out.getLong(1) == 6L && out.getDouble(2) == 4.0)
    assert(math.abs(out.getDouble(3) - math.rint(lam * 1e4) / 1e4) < 1e-9)
    assert(out.getDouble(4) == math.rint(1e4 / lam) / 1e4,
      "always-valid p = 1/lambda, capped at 1")
    // null effect: lambda < 1 -> p pinned to 1
    val nul = Seq(("m", false, 1.0), ("m", false, 3.0), ("m", true, 1.0),
      ("m", true, 3.0)).toDF("metric", "arm", "v")
    assert(Stats.msprt(nul, "metric", col("arm"), "v", 1.0)
      .collect().head.getDouble(4) == 1.0)
  }

  test("yuenTrimmedT: whale-proof — trims the spike Welch would chase") {
    import spark.implicits._
    // each arm: 4 tame values + one whale; trim 0.2 -> g=1, h=3
    val rows = Seq((false, 0.0), (false, 1.0), (false, 2.0), (false, 3.0),
      (false, 100.0), (true, 10.0), (true, 11.0), (true, 12.0),
      (true, 13.0), (true, 110.0)).toDF("arm", "v")
    val out = Stats.yuenTrimmedT(rows, col("arm"), "v", trim = 0.2)
      .collect().head
    assert((out.getLong(0), out.getLong(1), out.getLong(2), out.getLong(3))
      == ((5L, 5L, 3L, 3L)))
    assert(out.getDouble(4) == 2.0 && out.getDouble(5) == 12.0,
      "trimmed means drop the whale entirely")
    // winsorized var 1 each arm -> d = 4/(3*2) -> t = 10/sqrt(4/3), df = 4
    assert(out.getDouble(6) ==
      math.rint(10.0 / math.sqrt(4.0 / 3.0) * 1e4) / 1e4)
    assert(out.getDouble(7) == 4.0)
  }

  test("postStratifiedMean reweights sample means by population shares") {
    import spark.implicits._
    val pop = (Seq.fill(8)("A") ++ Seq.fill(2)("B")).zipWithIndex
      .map { case (s, i) => (s, i * 1.0) }.toDF("seg", "v")
    // the sample over-represents stratum B (3 of 5 rows vs 20% of pop)
    val samp = Seq(("A", 1.0), ("A", 3.0), ("B", 10.0), ("B", 20.0),
      ("B", 30.0)).toDF("seg", "v")
    val out = Stats.postStratifiedMean(pop, "seg", "v", samp).collect().head
    assert(out.getLong(0) == 10L && out.getLong(1) == 5L)
    assert(out.getDouble(2) == 12.8, "naive mean follows the skewed sample")
    assert(out.getDouble(3) == 0.8 * 2.0 + 0.2 * 20.0, // 5.6
      "post-stratification restores the population weighting")
    val se = math.sqrt(0.64 * 2.0 / 2.0 + 0.04 * 100.0 / 3.0)
    assert(out.getDouble(4) == math.rint(se * 1e4) / 1e4)
  }

  test("mahalanobisOutliers: axis-scaled top-k, constant feature contributes 0") {
    import spark.implicits._
    // f1 = [10,10,10,14,22] (one big, one small deviant); f2 constant —
    // a zero-variance feature must contribute 0, not Infinity
    val df = Seq((1L, 10L, 5L), (2L, 10L, 5L), (3L, 10L, 5L),
      (4L, 14L, 5L), (5L, 22L, 5L)).toDF("id", "f1", "f2")
    val out = Stats.mahalanobisOutliers(df, "id", Seq("f1", "f2"), topK = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    // moments: mu=13.2, ss=108.8, var=27.2 -> id5 (8.8^2/27.2), then the
    // three 10s (3.2^2/27.2) tie and break by id; id4 (0.8^2/27.2) misses
    def sc(x: Double) = math.rint((x - 13.2) * (x - 13.2) / 27.2 * 1e4) / 1e4
    assert(out.toSeq == Seq((5L, sc(22)), (1L, sc(10)), (2L, sc(10))))
    assert(out.forall(!_._2.isInfinite), "constant feature poisoned scores")
  }

  test("groupAuc: perfect separation 1, inversion 0, ties give midrank credit") {
    import spark.implicits._
    val df = Seq(
      ("sep", 1.0, false), ("sep", 2.0, false), ("sep", 3.0, true), ("sep", 4.0, true),
      ("inv", 1.0, true), ("inv", 2.0, true), ("inv", 3.0, false), ("inv", 4.0, false),
      ("tie", 2.0, true), ("tie", 2.0, false),
      ("deg", 1.0, true), ("deg", 2.0, true)).toDF("g", "s", "y")
    val out = Stats.groupAuc(df, "g", col("s"), col("y"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))).toMap
    assert(out("sep") == ((2L, 2L, 1.0)))
    assert(out("inv") == ((2L, 2L, 0.0)))
    assert(out("tie") == ((1L, 1L, 0.5)), "tied pair counts half concordant")
    assert(out("deg")._3.isNaN, "no negatives: AUC undefined, not dropped")
  }

  test("diffInDiff: textbook 2x2 cells recover the estimator and SE") {
    import spark.implicits._
    val rows = Seq((true, false, 1.0), (true, false, 3.0),   // T pre m=2
      (true, true, 5.0), (true, true, 7.0),                  // T post m=6
      (false, false, 2.0), (false, false, 4.0),              // C pre m=3
      (false, true, 3.0), (false, true, 5.0))                // C post m=4
      .toDF("treat", "post", "v")
    val out = Stats.diffInDiff(rows, col("treat"), col("post"), "v")
      .collect().head
    assert(out.getLong(0) == 8L)
    assert((out.getDouble(1), out.getDouble(2), out.getDouble(3),
      out.getDouble(4)) == ((2.0, 6.0, 3.0, 4.0)))
    // did = (6-2)-(4-3) = 3; each cell var 2 over n=2 -> se = 2, z = 1.5
    assert(out.getDouble(5) == 3.0 && out.getDouble(6) == 2.0)
    assert(out.getDouble(7) == 1.5)
  }

  test("emdDrift: identical groups 0, separated point masses give the closed form") {
    import spark.implicits._
    // identical distributions: each group == pooled -> EMD = KS = 0
    val same = (1 to 10).flatMap(i => Seq(("a", i.toDouble), ("b", i.toDouble)))
      .toDF("g", "v")
    val z = Stats.emdDrift(same, "g", "v", nBins = 64).collect()
    assert(z.forall(r => r.getDouble(2) == 0.0 && r.getDouble(3) == 0.0))
    // point masses at 0 and 64 (bin width exactly 1): each group's CDF is
    // 0.5 away from pooled over 63 of 64 bins -> EMD = 31.5, KS = 0.5
    val apart = ((1 to 20).map(_ => ("a", 0.0)) ++
      (1 to 20).map(_ => ("b", 64.0))).toDF("g", "v")
    val out = Stats.emdDrift(apart, "g", "v", nBins = 64)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out("a") == ((20L, 31.5, 0.5)) && out("b") == ((20L, 31.5, 0.5)))
    // hash/partition-layout invariance
    val rep = Stats.emdDrift(apart.repartition(7), "g", "v", nBins = 64)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(rep == out)
  }

  test("bradleyTerry: dominance orders strengths, symmetry ties them, mean stays 1") {
    import spark.implicits._
    val chain = (Seq.fill(4)(("A", "B")) ++ Seq(("B", "A")) ++
      Seq.fill(3)(("B", "C")) ++ Seq(("C", "B"))).toDF("w", "l")
    val out = Stats.bradleyTerry(chain, "w", "l", iters = 3)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // wins/comparison bookkeeping: A 4/5, B 4/9, C 1/4
    assert(out("A")._1 == 4L && out("A")._2 == 5L)
    assert(out("B")._1 == 4L && out("B")._2 == 9L)
    assert(out("C")._1 == 1L && out("C")._2 == 4L)
    // the dominance chain orders the strengths
    assert(out("A")._3 > out("B")._3 && out("B")._3 > out("C")._3)
    // mean-1 normalization (rounded strengths sum to ~K)
    assert(math.abs(out.values.map(_._3).sum - 3.0) < 0.01)
    // perfectly symmetric record -> equal strengths
    val even = (Seq.fill(2)(("X", "Y")) ++ Seq.fill(2)(("Y", "X")))
      .toDF("w", "l")
    val ev = Stats.bradleyTerry(even, "w", "l", iters = 3)
      .collect().map(r => r.getDouble(3))
    assert(ev.forall(_ == 1.0))
    // partition-layout invariance
    val rep = Stats.bradleyTerry(chain.repartition(5), "w", "l", iters = 3)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(rep == out)
  }

  test("jackknifeGroupSE: constant corpus gives zero SE; heterogeneity is positive; layout-invariant") {
    import spark.implicits._
    val const = (1 to 100).map(i => (i.toLong, 5.0)).toDF("u", "v")
    val c = Stats.jackknifeGroupSE(const, col("u"), "v", nGroups = 8)
      .collect().head
    assert(c.getLong(0) == 100L && c.getLong(1) == 8L)
    assert(c.getDouble(2) == 5.0 && c.getDouble(3) == 5.0 &&
      c.getDouble(4) == 0.0)
    // unit-level heterogeneity: whole units leave together -> SE > 0
    val het = (1 to 100).map(i => (i.toLong, (i % 10) * 2.0)).toDF("u", "v")
    val h = Stats.jackknifeGroupSE(het, col("u"), "v", nGroups = 8)
      .collect().head
    assert(h.getDouble(4) > 0.0)
    val rep = Stats.jackknifeGroupSE(het.repartition(11), col("u"), "v",
      nGroups = 8).collect().head
    assert(rep == h)
  }

  test("spearmanByGroup: monotone ±1, midrank ties hit the closed form, constant is null") {
    import spark.implicits._
    val rows = Seq(
      ("m", 1.0, 10.0), ("m", 2.0, 20.0), ("m", 3.0, 30.0),  // rho = 1
      ("r", 1.0, 3.0), ("r", 2.0, 2.0), ("r", 3.0, 1.0),     // rho = -1
      ("t", 1.0, 1.0), ("t", 1.0, 2.0), ("t", 2.0, 2.0),     // ties
      ("c", 5.0, 1.0), ("c", 5.0, 2.0)                       // constant x
    ).toDF("g", "x", "y")
    val out = Stats.spearmanByGroup(rows, "g", "x", "y")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))).toMap
    assert(out("m") == ((3L, Some(1.0))))
    assert(out("r") == ((3L, Some(-1.0))))
    // 2x midranks x:(3,3,6) y:(2,5,5) -> rho = 9/18 = 0.5
    assert(out("t") == ((3L, Some(0.5))))
    assert(out("c") == ((2L, None)), "zero-variance side yields null rho")
  }

  test("pettittChangepoint: step shift pins K and the earliest argmax day") {
    import spark.implicits._
    def ev(day: Int, n: Int) = (1 to n).map(_ =>
      ("a", java.sql.Timestamp.valueOf(f"2024-03-$day%02d 10:00:00")))
    // counts 1,1,1,1 then 3,3,3,3: every cross pair is +1 -> U_4 = 16
    val rows = ((1 to 4).flatMap(ev(_, 1)) ++ (5 to 8).flatMap(ev(_, 3)))
      .toDF("event_type", "ts")
    val r = Stats.pettittChangepoint(rows, "event_type", "ts")
      .collect().head
    assert(r.getLong(1) == 8L && r.getLong(2) == 16L)
    assert(r.getDate(3).toString == "2024-03-04",
      "the cut BEFORE the shift maximizes U")
    val p = 2.0 * math.exp(-6.0 * 256.0 / (512.0 + 64.0))
    assert(r.getDouble(4) == math.rint(p * 1e6) / 1e6)
  }

  test("kendallTauB: monotone ±1, the tied 2x2 grid scores 0, constant is null") {
    import spark.implicits._
    val rows = Seq(
      ("m", 1, 1), ("m", 2, 2), ("m", 3, 3),             // tau = 1
      ("r", 1, 3), ("r", 2, 2), ("r", 3, 1),             // tau = -1
      ("t", 1, 1), ("t", 1, 2), ("t", 2, 1), ("t", 2, 2), // nc=nd=1 -> 0
      ("c", 1, 7), ("c", 2, 7)                            // constant y
    ).toDF("g", "x", "y")
    val out = Stats.kendallTauB(rows, "g", "x", "y")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Double])))).toMap
    assert(out("m") == ((3L, 3L, 0L, Some(1.0))))
    assert(out("r") == ((3L, 0L, 3L, Some(-1.0))))
    assert(out("t") == ((4L, 1L, 1L, Some(0.0))),
      "n0=6 n1=n2=2: (1-1)/sqrt(4*4)")
    assert(out("c") == ((2L, 0L, 0L, None)), "tied-out side yields null")
  }

  test("krippendorffAlpha: hand-checked mixed-rater example; singletons drop") {
    import spark.implicits._
    // u1 AA, u2 AB, u3 BB, u4 lone B (drops), u5 AAB (3 raters)
    val rows = Seq((1L, "A"), (1L, "A"), (2L, "A"), (2L, "B"),
      (3L, "B"), (3L, "B"), (4L, "B"),
      (5L, "A"), (5L, "A"), (5L, "B"), (6L, null))
      .toDF("u", "c")
    val r = Stats.krippendorffAlpha(rows, "u", "c").collect().head
    // n=9, nA=5, nB=4, occ=5: alpha = 1 - 8*4/(81-41) = 0.2
    assert(r.getLong(0) == 4L && r.getLong(1) == 9L)
    assert(r.getDouble(2) == math.rint(5.0 / 9.0 * 1e6) / 1e6)
    assert(r.getDouble(3) == 0.2)
  }

  test("bootstrapMedianCI: exact lower median, ordered CI, layout-invariant") {
    import spark.implicits._
    val rows = (1 to 9).map(i => ("g", i.toLong, i * 10.0)).toDF("g", "id", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      Stats.bootstrapMedianCI(d, "g", "id", "v", b = 64).collect().head
    val r = run(rows)
    assert(r.getLong(1) == 9L && r.getDouble(3) == 50.0,
      "point estimate is the exact lower median")
    assert(r.getLong(2) >= 60L, "nearly all 64 replicates survive")
    val (lo, hi) = (r.getDouble(4), r.getDouble(5))
    assert(lo <= 50.0 && 50.0 <= hi && lo >= 10.0 && hi <= 90.0)
    assert((1 to 9).map(_ * 10.0).contains(lo) &&
      (1 to 9).map(_ * 10.0).contains(hi),
      "CI bounds are DATA values (percentile bootstrap), not interpolations")
    assert(run(rows.repartition(7)) == r, "hash weights: layout-invariant")
    // even-count lower median: values 10,20 -> 10
    val even = Seq(("e", 1L, 10.0), ("e", 2L, 20.0)).toDF("g", "id", "v")
    assert(run(even).getDouble(3) == 10.0)
  }

  test("rangePartitionAudit: full-sample bounds are exact quartiles, loads tie out") {
    import spark.implicits._
    val rows = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val out = Stats.rangePartitionAudit(rows, "id", "v", nParts = 4,
        samplePct = 100)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // bounds at v=25/50/75: partitions hold 24/25/25/26 rows
    assert(out(0L) == ((24L, 0.24, 0.96)))
    assert(out(1L) == ((25L, 0.25, 1.0)) && out(2L) == ((25L, 0.25, 1.0)))
    assert(out(3L) == ((26L, 0.26, 1.04)))
    assert(out.values.map(_._1).sum == 100L)
  }

  test("brierDecomposition: two-spike forecast hits the closed-form Murphy terms") {
    import spark.implicits._
    val rows = (Seq.fill(4)((0.1, false)) ++ Seq.fill(4)((0.9, true)))
      .toDF("s", "y")
    val r = Stats.brierDecomposition(rows, "s", "y", nBins = 20)
      .collect().head
    assert(r.getLong(0) == 8L && r.getDouble(1) == 0.5)
    assert(r.getDouble(2) == 0.01, "brier = mean (f-y)^2 = 0.01")
    assert(r.getDouble(3) == 0.01, "reliability: both bins off by 0.1")
    assert(r.getDouble(4) == 0.25, "resolution: bin rates 0/1 vs base 0.5")
    assert(r.getDouble(5) == 0.25)
    // constant within-bin forecasts: the Murphy identity holds (up to
    // the rounding of the already-rounded report columns)
    assert(math.abs(r.getDouble(2) -
      (r.getDouble(3) - r.getDouble(4) + r.getDouble(5))) < 1e-9)
  }

  test("ipfRaking: skewed 2x2 rakes toward uniform margins; shares tie out") {
    import spark.implicits._
    val rows = (Seq.fill(30)(("r1", "c1")) ++ Seq.fill(10)(("r1", "c2")) ++
      Seq.fill(10)(("r2", "c1")) ++ Seq.fill(10)(("r2", "c2")))
      .toDF("r", "c")
    val out = Stats.ipfRaking(rows, col("r"), col("c"), iters = 3)
      .collect().map(x => (x.getString(0), x.getString(1)) ->
        ((x.getLong(2), x.getDouble(3), x.getDouble(4)))).toMap
    assert(out.size == 4 && out.values.forall(_._2 > 0.0))
    val shareSum = out.values.map(_._3).sum
    assert(math.abs(shareSum - 1.0) < 1e-6, "fitted shares are a distribution")
    val r1 = out(("r1", "c1"))._3 + out(("r1", "c2"))._3
    val c1 = out(("r1", "c1"))._3 + out(("r2", "c1"))._3
    assert(math.abs(r1 - 0.5) < 0.01 && math.abs(c1 - 0.5) < 0.01,
      "3 iterations pull both margins to uniform (raw row share was 2/3)")
    assert(out(("r1", "c1"))._2 < 1.0, "the overrepresented cell deflates")
  }

  test("funnelConversionTest: strict-after ordering, hand-checked z") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val rows = Seq(
      (1L, "view", 1L), (1L, "purchase", 2L),   // arm A converts
      (2L, "view", 1L),                          // arm A no purchase
      (3L, "view", 1L), (3L, "purchase", 2L),    // arm B converts
      (5L, "view", 1L), (5L, "purchase", 3L),    // arm B converts
      (4L, "purchase", 0L), (4L, "view", 1L)     // purchase BEFORE view
    ).map { case (u, t, s) => (u, t, ts(s)) }.toDF("u", "t", "ts")
    val r = Stats.funnelConversionTest(rows, "u", "ts", "t", "view",
      "purchase", col("u") >= 3L).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 1L &&
      r.getDouble(2) == 0.5)
    assert(r.getLong(3) == 3L && r.getLong(4) == 2L,
      "a purchase before the first view never counts")
    val z = (2.0 / 3.0 - 0.5) /
      math.sqrt(0.6 * 0.4 * (1.0 / 2.0 + 1.0 / 3.0))
    assert(r.getDouble(6) == math.rint(z * 1e4) / 1e4)
    assert(!r.getBoolean(7))
  }

  test("funnelConversionTest: a zero-entered arm stays visible with null z") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    // every user lands in arm A (u < 10); arm B never enters the funnel.
    // The old a×b crossJoin returned an EMPTY frame here — the surviving
    // arm's counts must be reported with nulls where nothing computes.
    val rows = Seq(
      (1L, "view", 1L), (1L, "purchase", 2L),
      (2L, "view", 1L)
    ).map { case (u, t, s) => (u, t, ts(s)) }.toDF("u", "t", "ts")
    val out = Stats.funnelConversionTest(rows, "u", "ts", "t", "view",
      "purchase", col("u") >= 10L).collect()
    assert(out.length == 1, "the report must not vanish on a missing arm")
    val r = out.head
    assert(r.getLong(0) == 2L && r.getLong(1) == 1L &&
      r.getDouble(2) == 0.5, "the surviving arm keeps its exact counts")
    assert(r.getLong(3) == 0L && r.getLong(4) == 0L)
    assert(r.isNullAt(5) && r.isNullAt(6) && r.isNullAt(7),
      "missing-arm rate, z, and the flag are null, not fabricated")
  }

  test("correlationMatrix: one pass, exact ±1 on linear columns, listwise deletion") {
    import spark.implicits._
    val rows = Seq(
      (Some(1.0), Some(2.0), Some(3.0)), (Some(2.0), Some(4.0), Some(2.0)),
      (Some(3.0), Some(6.0), Some(1.0)), (Some(9.0), Some(9.0), None)
    ).toDF("x", "y", "z")
    val out = Stats.correlationMatrix(rows, Seq("x", "y", "z"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out.size == 3)
    assert(out(("x", "y")) == ((3L, 1.0)), "y = 2x exactly")
    assert(out(("x", "z")) == ((3L, -1.0)) && out(("y", "z")) == ((3L, -1.0)))
    // the null-z row is excluded from EVERY pair (listwise deletion)
  }

  test("ipsPolicyValue: greedy target, smoothed weights, hand-checked estimates") {
    import spark.implicits._
    // x1: A 2x10 (picked), B 2x2; x2: A 1x1, B 3x5 (picked); |A|=2
    val rows = Seq(
      (1L, "A", 10.0), (1L, "A", 10.0), (1L, "B", 2.0), (1L, "B", 2.0),
      (2L, "A", 1.0), (2L, "B", 5.0), (2L, "B", 5.0), (2L, "B", 5.0)
    ).toDF("u", "a", "r")
    val out = Stats.ipsPolicyValue(rows, col("u"), "a", "r")
      .collect().head
    assert(out.getLong(0) == 2L && out.getLong(1) == 8L &&
      out.getLong(2) == 5L)
    assert(out.getDouble(3) == 5.0, "behavior value = overall mean")
    // iw = (4+2)/(n_m+1): 2 and 1.5 -> wr = 20*2 + 15*1.5 = 62.5
    assert(out.getDouble(4) == 7.8125, "IPS = 62.5/8")
    assert(out.getDouble(5) == math.rint(62.5 / 8.5 * 1e4) / 1e4,
      "SNIPS = 62.5/8.5 (smoothed weights de-telescope the denominator)")
    assert(out.getDouble(6) == 0.625)
  }

  test("mixShiftDecomposition: contributions reconstruct the delta; fills keep the identity") {
    import spark.implicits._
    val rows = Seq(
      ("s1", false, 10.0), ("s1", false, 10.0),
      ("s2", false, 20.0), ("s2", false, 20.0),
      ("s1", true, 10.0), ("s1", true, 10.0), ("s1", true, 10.0),
      ("s2", true, 30.0)
    ).toDF("s", "pb", "v")
    val out = Stats.mixShiftDecomposition(rows, "s", col("pb"), "v")
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6),
          r.getDouble(7), r.getDouble(8)))).toMap
    assert(out("s1") == ((0.5, 0.75, 10.0, 10.0, 2.5, 0.0)))
    assert(out("s2") == ((0.5, 0.25, 20.0, 30.0, -5.0, 2.5)))
    // R_A = R_B = 15: the contributions must cancel exactly
    assert(out.values.map(v => v._5 + v._6).sum == 0.0)
    // a segment absent from period A fills rate_a with R_A; identity holds
    val withNew = rows.union(Seq(("s3", true, 50.0)).toDF("s", "pb", "v"))
    val o2 = Stats.mixShiftDecomposition(withNew, "s", col("pb"), "v")
      .collect().map(r => (r.getDouble(7), r.getDouble(8)))
    val delta = (30.0 + 30.0 + 50.0) / 5.0 - 15.0 // R_B - R_A
    assert(math.abs(o2.map(v => v._1 + v._2).sum - delta) < 1e-9,
      "mix + rate sums reconstruct the overall move even with fills")
  }

  test("prCurve: cumulative-from-top counts, F1 identity, exact rows") {
    import spark.implicits._
    val rows = Seq((0.1, false), (0.3, true), (0.6, true),
      (0.9, true), (0.9, false)).toDF("s", "y")
    val out = Stats.prCurve(rows, "s", "y", nBins = 4)
      .collect().map(r => r.getDouble(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    assert(out(0.75) == ((2L, 1L, 0.5, math.rint(1e6 / 3.0) / 1e6, 0.4)))
    val r23 = math.rint(2e6 / 3.0) / 1e6
    assert(out(0.5) == ((3L, 2L, r23, r23, r23)))
    assert(out(0.25) == ((4L, 3L, 0.75, 1.0, math.rint(6e6 / 7.0) / 1e6)))
    assert(out(0.0) == ((5L, 3L, 0.6, 1.0, 0.75)))
  }
}
