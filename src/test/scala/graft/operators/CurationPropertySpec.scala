package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Property-based checks for the curation planners against independent
  * executable models (the MergePropertySpec treatment applied to the
  * allocation/accounting operators): random inputs, invariants that must
  * hold for EVERY input, and reference recomputations that avoid sharing
  * the operator's own formula.
  */
class CurationPropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(prop: Prop, n: Int = 15): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  test("waterFillAllocation: invariants + agreement with a binary-search solver") {
    val genSrc = for {
      cap <- Gen.choose(50L, 5000L)
      w <- Gen.choose(1, 10)
    } yield (cap, w.toDouble)
    val gen = for {
      n <- Gen.choose(2, 6)
      srcs <- Gen.listOfN(n, genSrc)
      budget <- Gen.choose(100L, 12000L)
    } yield (srcs.zipWithIndex.map { case ((c, w), i) => (s"s$i", c, w) }, budget)
    check(Prop.forAll(gen) { case (srcs, budget) =>
      val wsum = srcs.map(_._3).sum
      val weights = srcs.map(s => s._1 -> s._3 / wsum).toMap
      val docs = srcs.map(s => (s._1, s._2)).toDF("src", "tok")
      val out = Sampling.waterFillAllocation(docs, "src", "tok", weights, budget)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(2), r.getBoolean(4), r.getLong(5),
            if (r.isNullAt(7)) None else Some(r.getDouble(7))))).toMap
      val caps = srcs.map(s => s._1 -> s._2.toDouble).toMap
      val totalCap = caps.values.sum
      // independent solver: binary-search the level T with f(T) = budget
      def f(t: Double) = caps.map { case (s, c) => math.min(c, weights(s) * t) }.sum
      val alloc = out.view.mapValues(_._3).toMap
      val allocSum = alloc.values.sum
      if (totalCap <= budget) {
        // budget beyond capacity: everything saturates, no finite level
        out.forall { case (s, (cap, sat, a, lvl)) =>
          sat && a == cap && lvl.isEmpty } && allocSum == totalCap.toLong
      } else {
        var lo = 0.0; var hi = 1e12
        (1 to 200).foreach { _ =>
          val mid = (lo + hi) / 2; if (f(mid) < budget) lo = mid else hi = mid }
        val tStar = hi
        out.forall { case (s, (cap, sat, a, lvl)) =>
          val ratio = caps(s) / weights(s)
          val levelOk = lvl.exists(l => math.abs(l - tStar) < math.max(1.0, tStar * 1e-6))
          val satOk = if (sat) a == cap && ratio <= tStar * (1 + 1e-9) + 1
                      else a <= cap && ratio >= tStar * (1 - 1e-9) - 1
          // unsaturated allocs are floor(w * level): within 1 of w*T*
          val propOk = sat || math.abs(a - weights(s) * tStar) <= 2.0
          levelOk && satOk && propOk
        } &&
          // the floor leaves at most one token per unsaturated source unspent
          allocSum <= budget && budget - allocSum <= srcs.size
      }
    })
  }

  test("vocabCoverage equals an exact in-memory recomputation") {
    val genDoc = Gen.listOf(Gen.oneOf("a", "b", "c", "d", "e", "f"))
      .map(_.mkString(" "))
    val gen = for {
      docs <- Gen.nonEmptyListOf(genDoc)
      ks <- Gen.nonEmptyListOf(Gen.choose(1, 8)).map(_.distinct)
    } yield (docs, ks)
    check(Prop.forAll(gen) { case (docs, ks) =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
      val out = Corpus.vocabCoverage(df, "text", ks)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // model: same tokenizer (split on \s+ of trimmed lowercase — empty
      // text yields the "" token, like Spark's split)
      val toks = docs.flatMap(t => t.trim.toLowerCase.split("\\s+").toSeq)
      val counts = toks.groupBy(identity).view.mapValues(_.size.toLong).toSeq
        .sortBy { case (tok, c) => (-c, tok) }
      ks.forall { k =>
        out(k.toLong) == counts.take(k).map(_._2).sum
      }
    })
  }

  test("surrogateKeyAudit equals the driver-side portable-hash recomputation") {
    val gen = for {
      n <- Gen.choose(1, 120)
      widths <- Gen.nonEmptyListOf(Gen.choose(2, 12)).map(_.distinct)
    } yield (n, widths)
    check(Prop.forAll(gen) { case (n, widths) =>
      val keys = (1 to n).map(i => s"k$i")
      val out = Stats.surrogateKeyAudit(keys.toDF("k"), "k", widths)
        .collect().map(r => r.getLong(0).toInt ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5)))).toMap
      widths.forall { b =>
        val buckets = keys.map(k =>
          graft.functions.Hashes.portableHash32Local(k) % (1L << b))
          .groupBy(identity).view.mapValues(_.size).values.toSeq
        out(b) == ((keys.size.toLong, buckets.size.toLong,
          (keys.size - buckets.size).toLong, buckets.max.toLong))
      }
    })
  }
}
