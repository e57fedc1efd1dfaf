package graft.operators

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  test("ruleReport: one pass, null predicate results count as failures") {
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 5.0), (2L, -1.0), (null, 3.0), (4L, null)
    ).toDF("id", "v")
    val out = DataQuality.ruleReport(df, Seq(
        "id_not_null" -> col("id").isNotNull,
        "v_positive" -> (col("v") > 0)))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("id_not_null") == ((4L, 1L, 0.25)))
    // v > 0 is NULL for the null value -> failure, plus the -1.0 row
    assert(out("v_positive") == ((4L, 2L, 0.5)))
  }

  test("ruleReport plans a single scan of the input") {
    val df = Seq((1L, 2.0), (3L, 4.0)).toDF("id", "v")
    val plan = DataQuality.ruleReport(df, Seq(
        "a" -> col("id").isNotNull, "b" -> (col("v") > 0),
        "c" -> (col("id") < 10))).queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    assert(plan.collect { case l: LocalRelation => l }.size == 1,
      s"rules must share ONE scan:\n$plan")
  }

  test("referentialIntegrity counts missing parents and null child keys") {
    val child = Seq[java.lang.Long](1L, 2L, 2L, 5L, null).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = DataQuality.referentialIntegrity(
      child, "fk", parent, "pk", "c_p").head()
    assert(r.getString(0) == "c_p")
    assert(r.getLong(1) == 5L)
    assert(r.getLong(2) == 2L) // the 5L orphan + the null key
    assert(r.getDouble(3) == 0.4)
  }

  test("freshnessReport lags are whole seconds behind the global max") {
    def ts(s: String) = Timestamp.valueOf(s)
    val df = Seq(
      ("a", ts("2024-01-01 10:00:00")), ("a", ts("2024-01-01 12:00:00")),
      ("b", ts("2024-01-01 11:59:58")),
      ("c", ts("2024-01-01 09:00:00"))
    ).toDF("g", "ts")
    val out = DataQuality.freshnessReport(df, "g", "ts")
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out("a") == ((2L, 0L)))
    assert(out("b") == ((1L, 2L)))
    assert(out("c") == ((1L, 3L * 3600)))
  }

  test("freshnessReport surfaces a dead feed (all-null ts) with null lag") {
    def ts(s: String) = Timestamp.valueOf(s)
    val df = Seq(
      ("live", ts("2024-01-01 10:00:00")),
      ("dead", null.asInstanceOf[Timestamp]),
      ("dead", null.asInstanceOf[Timestamp])
    ).toDF("g", "ts")
    val rows = DataQuality.freshnessReport(df, "g", "ts")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("live", "dead"), "dead feed must not vanish")
    val dead = rows("dead")
    assert(dead.isNullAt(1) && dead.isNullAt(3)) // last_ts, lag_seconds
    assert(dead.getLong(2) == 2L)                // n_rows counts every row
    assert(rows("live").getLong(3) == 0L)
  }

  test("kAnonymityAudit: class-size profile, null sensitive adds size not diversity") {
    // classes over (zip): {10001: 3 rows, 2 distinct diag + null},
    // {10002: 1 row} (singleton -> at risk at k=2), {10003: 2 rows, 1 diag}
    val df = Seq(
      ("10001", "flu"), ("10001", "cold"), ("10001", null),
      ("10002", "flu"),
      ("10003", "flu"), ("10003", "flu")
    ).toDF("zip", "diag")
    val out = DataQuality.kAnonymityAudit(df, Seq("zip"), "diag", k = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out(1L) == ((1L, 1L, 1L, true)), "singleton class is at risk")
    assert(out(2L) == ((1L, 2L, 1L, false)), "size-2 l=1: k-safe, l-leaky")
    assert(out(3L) == ((1L, 3L, 2L, false)), "null diversifies nothing")
    assert(out.values.map(_._2).sum == df.count())
  }

  test("datasetFingerprint: order/partition invariant, distinguishes null vs empty") {
    val base = Seq(("s", 1L, "x"), ("s", 2L, "y"), ("s", 3L, null))
      .toDF("g", "id", "v")
    val fp = DataQuality.datasetFingerprint(base, "g", Seq("id", "v"))
      .collect().head
    val shuffled = DataQuality.datasetFingerprint(
      base.orderBy(org.apache.spark.sql.functions.col("id").desc)
        .repartition(7), "g", Seq("id", "v")).collect().head
    assert(fp.getLong(1) == 3L)
    assert(fp.getLong(2) == shuffled.getLong(2) &&
      fp.getLong(3) == shuffled.getLong(3),
      "fingerprint must not depend on row order or partitioning")
    val emptied = DataQuality.datasetFingerprint(
      Seq(("s", 1L, "x"), ("s", 2L, "y"), ("s", 3L, "")).toDF("g", "id", "v"),
      "g", Seq("id", "v")).collect().head
    assert(emptied.getLong(2) != fp.getLong(2),
      "null and empty string must fingerprint differently")
    // single-row corruption flips both combiners
    val tweaked = DataQuality.datasetFingerprint(
      Seq(("s", 1L, "x"), ("s", 2L, "y"), ("s", 3L, "z")).toDF("g", "id", "v"),
      "g", Seq("id", "v")).collect().head
    assert(tweaked.getLong(2) != fp.getLong(2) &&
      tweaked.getLong(3) != fp.getLong(3))
  }

  test("benfordAudit: digit of the integer part, sub-1 rows excluded, 9-row spine") {
    // 111, 19.5, 1.2 -> digit 1 x3; 250 -> 2; 0.8 -> excluded; 9000 -> 9
    val df = Seq(111.0, 19.5, 1.2, 250.0, 0.8, 9000.0).toDF("v")
    val out = DataQuality.benfordAudit(df, "v")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out.keySet == (1L to 9L).toSet, "all nine digits always present")
    assert(out(1L)._1 == 3L && out(2L)._1 == 1L && out(9L)._1 == 1L)
    assert(out(3L)._1 == 0L && out(3L)._2 == 0.0)
    assert(out.values.map(_._1).sum == 5L, "the 0.8 row must not count")
    assert(out(1L)._2 == 0.6)                     // 3/5
    assert(math.abs(out(1L)._3 - 0.30103) < 1e-6) // log10(2)
    // expectations sum to 1 (a distribution, not a heuristic)
    val expSum = out.values.map(_._3).sum
    assert(math.abs(expSum - 1.0) < 1e-4)
  }

  test("disparateImpact: 80% rule flags the half-rate group; null outcome = not selected") {
    val df = Seq(
      ("A", Some(true)), ("A", Some(true)), ("A", Some(true)), ("A", Some(true)),
      ("B", Some(true)), ("B", Some(true)), ("B", Some(false)), ("B", None),
      ("C", Some(true)), ("C", Some(true)), ("C", Some(true)), ("C", Some(false))
    ).toDF("g", "sel")
    val out = DataQuality.disparateImpact(df, "g",
        org.apache.spark.sql.functions.col("sel"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4),
          r.getDouble(5), r.getBoolean(6)))).toMap
    assert(out("A") == ((4L, 4L, 1.0, "A", 1.0, true)), "reference group")
    val (bn, bs, brate, bref, bratio, bpass) = out("B")
    assert(bn == 4L && bs == 2L && brate == 0.5 && bref == "A")
    assert(bratio == 0.5 && !bpass, "half the reference rate fails the 80% rule")
    assert(out("C")._5 == 0.75 && !out("C")._6)
  }

  test("dpNoisyCounts: bounded integer noise, clamped release, layout-invariant") {
    import spark.implicits._
    val cum = DataQuality.discreteLaplaceCum(1.0)
    assert(cum.last._1 == 22 && cum.map(_._2).sliding(2)
      .forall(p => p(0) < p(1)), "monotone CDF truncated at K=22")
    assert(math.abs(cum.last._2 - 1.0) < 1e-8, "tail mass < 1e-8 remains")
    val rows = (1 to 500).map(i => ("g" + (i % 5), i)).toDF("g", "x")
    def run(d: org.apache.spark.sql.DataFrame) =
      DataQuality.dpNoisyCounts(d, "g", seed = "dp", epsilon = 1.0)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val out = run(rows)
    assert(out.size == 5 && out.values.forall(_._1 == 100L))
    assert(out.values.forall { case (t, rel, eps) =>
      rel >= 0L && math.abs(rel - t) <= 22L && eps == 1.0 },
      "noise stays inside the truncated support")
    assert(run(rows.repartition(13)) == out, "hash noise is layout-invariant")
    // tiny true counts clamp at zero rather than releasing negatives
    val tiny = Seq.fill(1)(("only", 1)).toDF("g", "x")
    assert(run(tiny)("only")._2 >= 0L)
  }

  test("rareCategoryCollapse: tail and nulls fold into OTHER, shares tie out") {
    import spark.implicits._
    val rows = (Seq.fill(5)("big") ++ Seq.fill(3)("mid") ++
      Seq("rare1", "rare2") ++ Seq(null.asInstanceOf[String]))
      .map(Tuple1(_)).toDF("c")
    val out = DataQuality.rareCategoryCollapse(rows, "c", minSupport = 3)
      .collect().map(r => r.getString(0) ->
        ((r.getBoolean(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(out("big") == ((false, 5L, 1L, math.rint(5e6 / 11.0) / 1e6)))
    assert(out("mid")._2 == 3L)
    assert(out("__OTHER__") == ((true, 3L, 3L,
      math.rint(3e6 / 11.0) / 1e6)),
      "two rare categories + the null row fold into one OTHER")
    assert(out.values.map(_._2).sum == 11L)
  }

  test("featureHashAudit: loads tie out; expectation matches the closed form") {
    import spark.implicits._
    val rows = (1 to 50).map(i => "cat" + i).map(Tuple1(_)).toDF("c")
    val r = DataQuality.featureHashAudit(rows, "c", bits = 4).collect().head
    assert(r.getLong(0) == 50L && r.getLong(1) == 16L)
    assert(r.getLong(2) <= 16L && r.getLong(5) >= 4L,
      "50 cats into 16 buckets: max load >= ceil(50/16)")
    assert(r.getLong(4) >= r.getLong(3) * 2,
      "each colliding bucket holds at least two categories")
    assert(r.getLong(0) - r.getLong(4) + r.getLong(3) == r.getLong(1) ||
      r.getLong(2) < r.getLong(1),
      "used buckets = singletons + colliding buckets")
    val exp = 50.0 - 16.0 * (1.0 - math.pow(1.0 - 1.0 / 16.0, 50.0))
    assert(r.getDouble(6) == math.rint(exp * 1e4) / 1e4)
  }
}
