package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("temperatureMix alpha edges: 1.0 keeps natural shares, 0.0 equalizes") {
    val rows = ((1 to 900).map(i => ("big", i.toLong)) ++
      (1 to 100).map(i => ("small", 10000L + i))).toDF("src", "id")
    // alpha=1: weights proportional to n -> every source keeps the SAME
    // fraction (target/total = 40%)
    val nat = Sampling.temperatureMix(rows, "src", "id", alpha = 1.0,
        targetRows = 400).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(nat("big") == nat("small") && nat("big") == 4000L)
    // alpha=0: every source weights 1 -> equal ABSOLUTE targets (200 each),
    // so the small source keeps all and the big keeps 200/900
    val uni = Sampling.temperatureMix(rows, "src", "id", alpha = 0.0,
        targetRows = 400).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(uni("small") == 10000L) // capped keep-all
    assert(uni("big") == 2222L)    // 400*1000*10000/(2000*900)
  }

  test("temperatureMix upweights small sources at alpha=0.5 and is deterministic") {
    // 900 rows of 'big', 100 of 'small': natural share 90/10; at alpha=0.5
    // weights are 30k/10k -> target shares 75/25 of targetRows=400
    val rows = ((1 to 900).map(i => ("big", i.toLong)) ++
      (1 to 100).map(i => ("small", 10000L + i))).toDF("src", "id")
    val out = Sampling.temperatureMix(rows, "src", "id", alpha = 0.5,
        targetRows = 400).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val (bigN, bigPm, bigKept) = out("big")
    val (smallN, smallPm, smallKept) = out("small")
    assert(bigN == 900L && smallN == 100L)
    // integer arithmetic: big permille = 400*30000*10000/(40000*900) = 3333
    assert(bigPm == 3333L)
    // small: 400*10000*10000/(40000*100) = 10000 (capped keep-all)
    assert(smallPm == 10000L)
    assert(smallKept == 100L) // small source keeps everything
    // kept fraction of big ~ permille/10000 (hash-uniform within ~5%)
    assert(math.abs(bigKept / 900.0 - 0.3333) < 0.05)
    // partition-layout invariance
    val again = Sampling.temperatureMix(rows.repartition(7), "src", "id",
        alpha = 0.5, targetRows = 400).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(again("big") == bigKept && again("small") == smallKept)
  }

  import spark.implicits._

  private def docs = (1L to 200L).map(i => (i, s"lang${i % 3}", "word " * (i % 50).toInt))
    .toDF("doc_id", "lang", "text")

  test("deterministicSample is reproducible and roughly proportional") {
    val s1 = Sampling.deterministicSample(docs, "doc_id", 0.2)
      .select("doc_id").as[Long].collect().toSet
    val s2 = Sampling.deterministicSample(docs, "doc_id", 0.2)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 == s2)                       // same sample every run
    assert(s1.size > 20 && s1.size < 60)   // ~40 expected
    // monotone: a larger fraction contains the smaller sample
    val s3 = Sampling.deterministicSample(docs, "doc_id", 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(s1.subsetOf(s3))
    assert(Sampling.deterministicSample(docs, "doc_id", 0.0).count() == 0)
    assert(Sampling.deterministicSample(docs, "doc_id", 1.0).count() == 200)
  }

  test("stratifiedSample returns exactly n per stratum, deterministically") {
    val out = Sampling.stratifiedSample(docs, "lang", "doc_id", 7)
    val counts = out.groupBy("lang").count().select("count").as[Long].collect()
    assert(counts.toSeq == Seq(7L, 7L, 7L))
    val again = Sampling.stratifiedSample(docs, "lang", "doc_id", 7)
    assert(rowsOf(out) == rowsOf(again))
  }

  test("samplePerGroup == stratifiedSample (aggregate path matches window path)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val viaAgg = Sampling.samplePerGroup(docs, "lang", "doc_id", 7)
      .select("lang", "doc_id")
    val viaWindow = Sampling.stratifiedSample(docs, "lang", "doc_id", 7)
      .select("lang", "doc_id")
    assert(rowsOf(viaAgg) == rowsOf(viaWindow))
    // the point of the aggregate path: partial (map-side) top-k, no Window
    val p = viaAgg.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p)
    assert(p.contains("partial_topk_agg"), p)
  }

  test("mixtureSample keeps per-source fractions, drops unlisted sources, reproducible") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val weights = Map("src0" -> 1.0, "src1" -> 0.5, "src5" -> 0.0)
    val out = Sampling.mixtureSample(docs, "source", "doc_id", weights)
    val bySrc = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("src0") == 25)                   // weight 1.0 keeps all
    assert(bySrc.getOrElse("src5", 0L) == 0L)     // weight 0.0 drops all
    assert(!bySrc.contains("src9"))               // unlisted source dropped
    val k1 = bySrc.getOrElse("src1", 0L)
    assert(k1 > 0 && k1 < 25, s"src1 kept $k1 of 25")  // fractional keep
    assert(rowsOf(out) == rowsOf(
      Sampling.mixtureSample(docs, "source", "doc_id", weights)))
  }

  test("packByTokenBudget assigns contiguous packs under the budget") {
    val df = Seq(
      (1L, "s", "a " * 100), (2L, "s", "b " * 100), (3L, "s", "c " * 100),
      (4L, "t", "d " * 10)
    ).toDF("doc_id", "source", "text")
    val out = Sampling.packByTokenBudget(df, "source", "doc_id",
      TextAnalysis.tokenCount(col("text")), budget = 150)
      .select("doc_id", "pack_id", "pack_offset")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == ((0L, 0L)))     // starts pack 0
    assert(out(2L) == ((0L, 100L)))   // 100 tokens before it -> still pack 0
    assert(out(3L) == ((1L, 50L)))    // 200 before -> pack 1, offset 50
    assert(out(4L) == ((0L, 0L)))     // separate group restarts
  }

  test("leakageSafeSplit: clusters never straddle splits; singletons split alone") {
    val docs = (1L to 30L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    // components: {1,2,3} and {10,11}; everyone else is a singleton
    val components = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("node", "component")
    val out = Sampling.leakageSafeSplit(docs, components, "doc_id",
        Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out.size == 30)
    // cluster cohesion: all members share both component and split
    assert(Set(out(1L), out(2L), out(3L)).size == 1)
    assert(Set(out(10L), out(11L)).size == 1)
    // singletons component on their own id
    assert(out(7L)._1 == 7L)
    assert(out.values.map(_._2).toSet.subsetOf(Set("train", "val", "test")))
    // partition-layout invariant
    val again = Sampling.leakageSafeSplit(docs.repartition(7),
        components.repartition(3), "doc_id",
        Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(again == out)
  }

  test("leakageSafeSplit: string ids keep their native type and never null out") {
    // regression: the long cast used to null every non-numeric id's
    // component_id, silently dumping ALL docs into the last split
    val docs = Seq("u-alpha", "u-beta", "u-gamma", "u-delta", "u-eps",
        "u-zeta", "u-eta", "u-theta").toDF("doc_id")
    val components = Seq(("u-alpha", "u-alpha"), ("u-beta", "u-alpha"))
      .toDF("node", "component")
    val out = Sampling.leakageSafeSplit(docs, components, "doc_id",
        Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out.size == 8)
    // no component_id is null and singletons carry their own string id
    assert(out.values.forall(_._1 != null))
    assert(out("u-gamma")._1 == "u-gamma")
    // the cluster still coheres
    assert(out("u-alpha") == out("u-beta"))
    // the old bug put every doc in the LAST split; with real hashing the
    // 8 ids must not all collapse into "test"
    assert(out.values.map(_._2).toSet != Set("test"))
  }

  test("tokenBudgetSample fills each source to its budget, drops unbudgeted sources") {
    import spark.implicits._
    val docs = (1L to 40L).map(i =>
      (i, if (i % 2 == 0) "a" else "b", 10L)).toDF("id", "src", "toks")
    val out = Sampling.tokenBudgetSample(docs, "src", "id", "toks",
      budgets = Map("a" -> 55L, "b" -> 200L))
    val bySrc = out.collect().groupBy(_.getString(1))
    // budget 55 at 10 tokens/doc -> exactly 5 docs; 200 -> all 20 of source b
    assert(bySrc("a").length == 5)
    assert(bySrc("b").length == 20)
    assert(bySrc("a").map(_.getLong(3)).max == 50L)
    // unbudgeted source vanishes
    val out2 = Sampling.tokenBudgetSample(docs, "src", "id", "toks",
      budgets = Map("a" -> 55L))
    assert(out2.filter($"src" === "b").count() == 0)
    // deterministic: same prefix both runs
    val ids1 = out.filter($"src" === "a").select("id").as[Long].collect().toSet
    val ids2 = Sampling.tokenBudgetSample(docs, "src", "id", "toks",
        budgets = Map("a" -> 55L, "b" -> 200L))
      .filter($"src" === "a").select("id").as[Long].collect().toSet
    assert(ids1 == ids2)
  }

  test("weightedSample matches the local A-ES reference and excludes non-positive weights") {
    val rows = (1L to 50L).map(i =>
      (i, if (i <= 5) 0.0 else i.toDouble)) :+ ((51L, -3.0)) :+ ((52L, 1000000.0))
    val df = rows.toDF("doc_id", "w")
    val out = Sampling.weightedSample(df, "doc_id", "w", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == 10)
    // local reference: same hash-uniform, same key, same ordering
    def u(id: Long): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).take(4)
        .map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / 4294967296.0
    }
    val expect = rows.filter(_._2 > 0)
      .map { case (id, w) => (math.log(u(id)) / w, id) }
      .sortBy { case (key, id) => (-key, id) }.take(10)
    assert(out.map(_._2).toSeq == expect.map(_._2))
    out.zip(expect).foreach { case ((_, _, got), (key, _)) =>
      assert(math.abs(got - BigDecimal(key).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
    // ranks are 1..k in key order
    assert(out.map(_._1).toSeq == (1L to 10L))
    // the huge-weight row should essentially always make the sample
    assert(out.map(_._2).contains(52L))
    // zero/negative weights never sampled
    assert(out.map(_._2).toSet.intersect(Set(1L, 2L, 3L, 4L, 5L, 51L)).isEmpty)
  }

  test("groupWeightedSample: k per stratum, zero-weight rows excluded, ranks contiguous") {
    val rows = (1L to 40L).map(i => ("a", i, i.toDouble)) ++
      (41L to 50L).map(i => ("b", i, 1.0)) :+ (("b", 99L, 0.0))
    val out = Sampling.groupWeightedSample(rows.toDF("g", "id", "w"),
        "g", "id", "w", k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byG = out.groupBy(_._1)
    assert(byG("a").length == 5 && byG("b").length == 5)
    assert(byG("a").map(_._2).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    // zero-weight id 99 never sampled
    assert(!out.exists(_._3 == 99L))
    // deterministic: a second run returns the identical sample
    val again = Sampling.groupWeightedSample(rows.toDF("g", "id", "w"),
        "g", "id", "w", k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSet == again.toSet)
  }

  test("epochMixPlan: caps repetition at maxEpochs and reports the deficit") {
    // en: 1000 tokens, de: 100, fr: 50; budget 2000 at 50/30/20
    val rows = Seq(("en", 1000L), ("de", 100L), ("fr", 50L), ("zh", 500L))
      .flatMap { case (s, n) => Seq((s, n / 2), (s, n - n / 2)) }
    val out = Sampling.epochMixPlan(rows.toDF("src", "toks"), "src", "toks",
        weights = Map("en" -> 0.5, "de" -> 0.3, "fr" -> 0.2),
        budgetTokens = 2000L, maxEpochs = 4.0)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(3), r.getLong(4), r.getDouble(5), r.getLong(6)))
      .toMap
    // en: target 1000 <= 1000*4 -> fully planned, 1 epoch, no deficit
    assert(out("en") == ((1000L, 1000L, 1000L, 1.0, 0L)))
    // de: target 600 > 100*4=400 -> capped at 4 epochs, deficit 200
    assert(out("de") == ((100L, 600L, 400L, 4.0, 200L)))
    // fr: target 400 > 50*4=200 -> capped, deficit 200
    assert(out("fr") == ((50L, 400L, 200L, 4.0, 200L)))
    // zh has no weight -> dropped
    assert(!out.contains("zh"))
  }

  test("balancedShards deals heaviest-first round-robin; hash dealing can skew") {
    import spark.implicits._
    // weights 100, 90, ..., 10: heaviest-first round-robin over 2 shards
    // puts {100, 80, 60, 40, 20} on shard 0 and {90, 70, 50, 30, 10} on 1
    val docs = (1L to 10L).map(i => (i, (11 - i) * 10)).toDF("id", "w")
    val assigned = Sampling.balancedShards(docs, "id", "w", nShards = 2,
        nRanges = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(assigned(1L) == 0L && assigned(2L) == 1L && assigned(3L) == 0L)
    val rep = Sampling.balancedShardReport(docs, "id", "w", nShards = 2,
        nRanges = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rep(0L) == ((5L, 300L)))
    assert(rep(1L) == ((5L, 250L))) // max/min sum ratio 1.2, one-doc bound
  }

  test("waterFillAllocation: saturated prefix gives capacity, rest fills at the solved level") {
    import spark.implicits._
    // capacities a=100, b=1000, c=1000; weights .5/.25/.25; budget 1000
    // a saturates (ratio 200 <= level); level = (1000-100)/0.5 = 1800
    // b,c alloc floor(.25*1800)=450 each; total = 100+450+450 = 1000
    val docs = Seq(("a", 100L), ("b", 1000L), ("c", 1000L))
      .flatMap { case (s, t) => Seq((s, t / 2), (s, t - t / 2)) }
      .toDF("src", "tok")
    val out = Sampling.waterFillAllocation(docs, "src", "tok",
        Map("a" -> 0.5, "b" -> 0.25, "c" -> 0.25), budgetTokens = 1000L)
      .collect().map(r => r.getString(0) ->
        ((r.getBoolean(4), r.getLong(5), r.getDouble(7)))).toMap
    assert(out("a") == ((true, 100L, 1800.0)))
    assert(out("b") == ((false, 450L, 1800.0)))
    assert(out("c") == ((false, 450L, 1800.0)))
  }

  test("waterFillAllocation: budget beyond capacity saturates everything, null level; unweighted sources drop") {
    import spark.implicits._
    val docs = Seq(("a", 10L), ("b", 20L), ("z", 999L)).toDF("src", "tok")
    val rows = Sampling.waterFillAllocation(docs, "src", "tok",
        Map("a" -> 0.5, "b" -> 0.5), budgetTokens = 1000L).collect()
    assert(rows.map(_.getString(0)).toSet == Set("a", "b")) // z unweighted
    assert(rows.forall(_.getBoolean(4)), "all saturated past total capacity")
    assert(rows.map(_.getLong(5)).sum == 30L) // alloc == capacity
    assert(rows.forall(_.isNullAt(7)), "no finite water level")
  }

  test("splitLeakageAudit: component-keyed split crosses zero pairs, per-doc split leaks") {
    import spark.implicits._
    val docs = (1L to 40L).map(i => (i, s"d$i")).toDF("doc_id", "txt")
    // duplicate families: consecutive id pairs (1,2), (3,4), ..., (39,40)
    val pairs = (1L to 39L by 2).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(pairs)
    val splits = Seq(("train", 0.5), ("test", 0.5))
    val safe = Sampling.leakageSafeSplit(docs, comps, "doc_id", splits)
    val naive = Sampling.leakageSafeSplit(docs, comps.limit(0), "doc_id", splits)
    val out = Sampling.splitLeakageAudit(pairs, "id_a", "id_b",
        Seq(("naive", naive), ("safe", safe)), "doc_id")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("safe") == ((20L, 0L)), "component split must never cross")
    val (nNaive, crossNaive) = out("naive")
    assert(nNaive == 20L)
    // 50/50 independent hashing crosses ~half the pairs; any nonzero count
    // proves the leak the audit exists to surface (deterministic given md5)
    assert(crossNaive > 0L, "per-doc hash split should leak on dup families")
  }

  test("packingReport: fill and boundary-crossing shares from the continuous packer") {
    import spark.implicits._
    // order 1,2,3; before: 0, 1000, 2500 -> packs 0,0,1; offsets 0,1000,452
    // doc 2 crosses the 2048 boundary (1000+1500), doc 3 does not
    val docs = Seq((1L, "a", 1000L), (2L, "a", 1500L), (3L, "a", 600L))
      .toDF("doc_id", "src", "tok")
    val r = Sampling.packingReport(docs, "src", "doc_id", col("tok"),
      budget = 2048).collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((3L, 3100L, 2L)))
    assert(r.getDouble(4) == 0.756836) // 3100 / (2*2048)
    assert(r.getLong(5) == 1L && r.getDouble(6) == 0.333333)
  }

  test("balancedShards weight ties break by id and ranks stay globally unique") {
    import spark.implicits._
    val docs = Seq((5L, 10), (3L, 10), (8L, 10), (1L, 10)).toDF("id", "w")
    val out = Sampling.balancedShards(docs, "id", "w", nShards = 3, nRanges = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    // equal weights -> rank order is id order: 1,3,5,8 -> shards 0,1,2,0
    assert(out.sortBy(_._2).map(_._1).toSeq == Seq(1L, 3L, 5L, 8L))
    assert(out.map(_._2).toSet == Set(1L, 2L, 3L, 4L))
    assert(out.sortBy(_._2).map(_._3).toSeq == Seq(0L, 1L, 2L, 0L))
  }

  test("neymanAllocation: n_h follows N_h*sigma_h; largest remainder sums exactly") {
    import spark.implicits._
    // A: {0,10} sigma 5, w 10; B: {7,7,7,7} sigma 0, w 0; C: {0,0,10,10}
    // sigma 5, w 20 -> shares of 10: A 3.33, B 0, C 6.67 -> floors 3/0/6,
    // remainder 1 goes to C (largest fraction)
    val rows = Seq(("A", 0L), ("A", 10L), ("B", 7L), ("B", 7L), ("B", 7L),
      ("B", 7L), ("C", 0L), ("C", 0L), ("C", 10L), ("C", 10L))
    val out = Sampling.neymanAllocation(rows.toDF("st", "v"), "st", "v", 10L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(out("A") == ((2L, 5.0, 3L)))
    assert(out("B") == ((4L, 0.0, 0L)), "zero-variance stratum gets nothing")
    assert(out("C") == ((4L, 5.0, 7L)))
    assert(out.values.map(_._3).sum == 10L, "allocations sum to the budget")
  }

  test("neymanAllocation: all-zero-variance strata allocate nothing at all") {
    import spark.implicits._
    // every stratum is constant -> total weight 0: the documented rule is
    // weight 0 everywhere, and the remainder bump must NOT hand +1s to
    // the alphabetically-first strata (they would neither sum to the
    // budget nor mean anything)
    val rows = Seq(("A", 5L), ("A", 5L), ("B", 7L), ("B", 7L), ("C", 1L))
    val out = Sampling.neymanAllocation(rows.toDF("st", "v"), "st", "v", 10L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out == Map("A" -> 0L, "B" -> 0L, "C" -> 0L),
      s"zero-variance rule must hold degenerately too: $out")
  }

  test("coldStartReport: shared entity never unseen; unique-per-row entities always unseen") {
    import spark.implicits._
    // one entity across all rows: both splits see it -> zero cold start
    val shared = (1 to 200).map(i => (i.toLong, 7L)).toDF("rid", "ent")
    val s = Sampling.coldStartReport(shared, "rid", "ent", testMod = 5)
      .collect().head
    assert(s.getLong(2) == 0L && s.getDouble(3) == 0.0 && s.getDouble(4) == 0.0)
    assert(s.getLong(0) > 0L, "the hash split must produce a test side")
    // every row its own entity: every test entity is cold -> shares 1.0
    val unique = (1 to 200).map(i => (i.toLong, i.toLong)).toDF("rid", "ent")
    val u = Sampling.coldStartReport(unique, "rid", "ent", testMod = 5)
      .collect().head
    assert(u.getLong(1) == u.getLong(2), "all test entities unseen")
    assert(u.getDouble(3) == 1.0 && u.getDouble(4) == 1.0)
    assert(u.getLong(0) == u.getLong(1), "one event per unique entity")
  }

  test("groupKFold: group-coherent, reproducible, folds within [0, k)") {
    import spark.implicits._
    val rows = (1 to 60).map(i => (i.toLong, s"group_${i % 12}"))
    val df = rows.toDF("id", "grp")
    val out = Sampling.groupKFold(df, "grp", 4)
      .select("grp", "fold").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    // every group maps to exactly ONE fold — the leakage-safety contract
    val byGroup = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert(byGroup.values.forall(_.size == 1),
      s"a group straddles folds: $byGroup")
    assert(out.forall { case (_, f) => f >= 0 && f < 4 })
    // reproducible across invocations (hash-based, not rand-based)
    val again = Sampling.groupKFold(df, "grp", 4)
      .select("grp", "fold").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSet
    assert(again == out.toSet)
    // 12 groups over 4 folds: at least 2 distinct folds occupied
    assert(out.map(_._2).toSet.size >= 2)
  }

  test("negativeSampling: no positives leak, catalog-closed, reproducible") {
    import spark.implicits._
    val pos = Seq((1L, 10L), (1L, 20L), (2L, 30L)).toDF("u", "it")
    val catalog = Seq(10L, 20L, 30L, 40L, 50L).toDF("item")
    def run(p: org.apache.spark.sql.DataFrame) =
      Sampling.negativeSampling(p, "u", "it", catalog, "item", k = 6)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val out = run(pos)
    val posSet = Set((1L, 10L), (1L, 20L), (2L, 30L))
    assert(out.forall { case (u, _, it) => !posSet((u, it)) },
      "a positive leaked into the negatives")
    assert(out.forall { case (_, s, it) =>
      s >= 0 && s < 6 && Set(10L, 20L, 30L, 40L, 50L)(it) })
    assert(out.nonEmpty && out.size <= 12)
    assert(run(pos.repartition(7)) == out, "hash draw is layout-invariant")
    // a catalog fully owned by the user yields nothing, not an error
    val tiny = Sampling.negativeSampling(Seq((1L, 99L)).toDF("u", "it"),
      "u", "it", Seq(99L).toDF("item"), "item", k = 4)
    assert(tiny.count() == 0)
  }

  test("shardMixingReport: single source lifts to 1, counts tie out, layout-invariant") {
    import spark.implicits._
    val mono = (1 to 200).map(i => (i.toLong, "s")).toDF("id", "src")
    val m = Sampling.shardMixingReport(mono, "id", "src", nShards = 4)
      .collect().head
    // every predecessor is the same source: adj_rate = share = lift = 1
    assert(m.getLong(1) == 200L && m.getDouble(4) == 1.0 &&
      m.getDouble(5) == 1.0 && m.getDouble(6) == 1.0)
    assert(m.getLong(2) == 196L, "4 shard-first rows have no predecessor")
    val mixed = (1 to 300).map(i => (i.toLong, "s" + (i % 3)))
      .toDF("id", "src")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.shardMixingReport(d, "id", "src", nShards = 8)
        .collect().map(_.toSeq).sortBy(_.head.toString)
    val out = run(mixed)
    assert(out.map(_(1).asInstanceOf[Long]).sum == 300L)
    assert(out.map(_(2).asInstanceOf[Long]).sum == 292L,
      "n_follow totals N minus the non-empty shard count")
    assert(run(mixed.repartition(7)).toSeq == out.toSeq,
      "hash order is layout-invariant")
  }
}
