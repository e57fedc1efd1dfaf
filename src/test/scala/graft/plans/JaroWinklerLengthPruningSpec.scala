package graft.plans

import graft.SparkSpec
import graft.functions.StringSimilarity
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class JaroWinklerLengthPruningSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    "acme corporation", "acme corporatoin", "acme", "a",
    "zzzz industries", "zzz industries llc", "acme corp intl",
    "", "acme corporation worldwide holdings").toDF("s")

  private def pairs = corpus.select(col("s").as("a"))
    .crossJoin(corpus.select(col("s").as("b")))

  private def withRule[T](body: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ JaroWinklerLengthPruning
    try body
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations
        .filterNot(_ eq JaroWinklerLengthPruning)
  }

  test("soundness bound: jw >= t implies the injected length ratio") {
    // brute property over all corpus pairs at several thresholds: the
    // real-arithmetic derivation min/max >= 5t-4 (relaxed by one byte)
    // never excludes a qualifying pair
    val strs = corpus.collect().map(_.getString(0))
    for (t <- Seq(0.85, 0.9, 0.95); x <- strs; y <- strs) {
      val jw = StringSimilarity.jaroWinkler(
        UTF8String.fromString(x).getBytes, UTF8String.fromString(y).getBytes)
      if (jw >= t) {
        val r = 5.0 * t - 4.0
        val (la, lb) = (UTF8String.fromString(x).numBytes.toDouble,
          UTF8String.fromString(y).numBytes.toDouble)
        assert(la >= r * lb - 1.0 && lb >= r * la - 1.0,
          s"bound violated for ('$x','$y') jw=$jw t=$t")
      }
    }
  }

  test("rule injects octet_length pruning above t=0.8, not at or below") {
    withRule {
      val hi = pairs.filter(StringSimilarity.jaroWinkler(
        spark, col("a"), col("b")) >= 0.9)
      assert(hi.queryExecution.optimizedPlan.toString.contains("octet_length"),
        hi.queryExecution.optimizedPlan.toString)
      val lo = pairs.filter(StringSimilarity.jaroWinkler(
        spark, col("a"), col("b")) >= 0.7)
      assert(!lo.queryExecution.optimizedPlan.toString.contains("octet_length"),
        "t <= 0.8 has a vacuous ratio bound; the filter must be untouched")
    }
  }

  test("results are identical with and without the rule") {
    def run() = pairs.filter(StringSimilarity.jaroWinkler(
        spark, col("a"), col("b")) >= 0.9)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val without = run()
    val withR = withRule(run())
    assert(withR == without, s"rule changed results: ${withR.diff(without)} / ${without.diff(withR)}")
    assert(without.nonEmpty, "corpus must exercise qualifying pairs")
    // and the corpus exercises real pruning: some pair fails the ratio
    val strs = corpus.collect().map(_.getString(0))
    assert(strs.exists(x => strs.exists(y =>
      x.length < 0.5 * y.length - 1)), "corpus must contain prunable pairs")
  }

  test("idempotent: a second application adds nothing") {
    val once = JaroWinklerLengthPruning(
      pairs.filter(StringSimilarity.jaroWinkler(
        spark, col("a"), col("b")) >= 0.9).queryExecution.analyzed)
    val twice = JaroWinklerLengthPruning(once)
    assert(once == twice)
  }
}
