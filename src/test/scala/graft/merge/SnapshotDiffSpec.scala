package graft.merge

import graft.SparkSpec

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  test("diff classifies added/removed/changed/unchanged per key") {
    val old = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "bal")
    val next = Seq((2L, "b", 20.0), (3L, "c", 99.0), (4L, "d", 40.0))
      .toDF("k", "name", "bal")
    val out = SnapshotDiff.diff(old, next, Seq("k"), Seq("name", "bal"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed",
      4L -> "added"))
  }

  test("fingerprint separates null from empty and column-boundary shifts") {
    // ("ab", null) must NOT collide with ("a", "b") or ("ab", "")
    val old = Seq((1L, "ab", Option.empty[String])).toDF("k", "x", "y")
    val shifted = Seq((1L, "a", Option("b"))).toDF("k", "x", "y")
    val empty = Seq((1L, "ab", Option(""))).toDF("k", "x", "y")
    def cls(n: org.apache.spark.sql.DataFrame) =
      SnapshotDiff.diff(old, n, Seq("k"), Seq("x", "y")).collect()(0).getString(1)
    assert(cls(shifted) == "changed")
    assert(cls(empty) == "changed")
    assert(cls(old) == "unchanged")
  }

  test("fingerprint is injection-proof: separator bytes in values can't shift boundaries") {
    // per-column hashing: ("ab","c") vs ("a","bc") and control-char payloads
    // must classify as changed
    val a = Seq((1L, "ab", "c"), (2L, "xy", "z")).toDF("k", "x", "y")
    val b = Seq((1L, "a", "bc"), (2L, "x", "yz")).toDF("k", "x", "y")
    val out = SnapshotDiff.diff(a, b, Seq("k"), Seq("x", "y"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "changed", 2L -> "changed"))
    // a value equal to the literal null sentinel is not null
    val withSentinel = Seq((1L, "n" * 32, "c")).toDF("k", "x", "y")
    val withNull = Seq((1L, null.asInstanceOf[String], "c")).toDF("k", "x", "y")
    assert(SnapshotDiff.diff(withSentinel, withNull, Seq("k"), Seq("x", "y"))
      .collect()(0).getString(1) == "changed")
  }

  test("diff supports composite keys") {
    val old = Seq((1L, "us", 10.0), (1L, "eu", 20.0)).toDF("k", "region", "v")
    val next = Seq((1L, "us", 10.0), (1L, "eu", 25.0), (2L, "us", 5.0))
      .toDF("k", "region", "v")
    val out = SnapshotDiff.diff(old, next, Seq("k", "region"), Seq("v"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getString(2)).toMap
    assert(out == Map((1L, "us") -> "unchanged", (1L, "eu") -> "changed",
      (2L, "us") -> "added"))
  }

  test("diffSummary counts keys per change type") {
    val old = (1L to 100L).map(i => (i, i * 2.0)).toDF("k", "v")
    val next = (1L to 110L).filter(_ % 10 != 0)
      .map(i => (i, if (i % 7 == 0) -1.0 else i * 2.0)).toDF("k", "v")
    val out = SnapshotDiff.diffSummary(old, next, Seq("k"), Seq("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // removed: multiples of 10 in 1..100 -> 10
    // added: 101..110 minus 110 -> 9
    // changed: %7==0, present both sides (not %10) -> 14 multiples of 7
    //   in 1..100, minus 70 (removed), plus none of 101..110 (105 is added
    //   fresh, counts as added not changed) -> 13
    assert(out("removed") == 10L)
    assert(out("added") == 9L)
    assert(out("changed") == 13L)
    assert(out("unchanged") == 100L - 10L - 13L)
  }
}
