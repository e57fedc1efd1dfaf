package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashes

/** Deterministic sampling and sequence packing for training-data curation.
  *
  * Training pipelines need REPRODUCIBLE samples (rand() re-rolls per task
  * retry and per run): both operators key off the portable hash of a stable
  * id, so the same corpus always yields the same sample, on any cluster
  * size, and an external system (or the DuckDB oracle) can recompute
  * membership exactly.
  */
object Sampling {

  /** Keep ~`fraction` of rows, chosen by id-hash — reproducible, unlike
    * df.sample(). One codegen'd filter, no shuffle, fully pushdown-friendly. */
  def deterministicSample(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction in [0,1]")
    val bucket = pmod(Hashes.portableHash32(col(idCol).cast("string")), lit(10000L))
    df.filter(bucket < lit(math.round(fraction * 10000).toDouble))
  }

  /** Deterministic shard assignment for dataset export: shard =
    * portable-hash(id) mod nShards — reproducible across runs and engines,
    * uniform in expectation, and a pure projection (repartition ON the
    * shard column before the partitioned write to get one file set per
    * shard, as in [[graft.operators.Similarity.writeIvfIndex]]). */
  def shardAssign(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards > 0, "nShards > 0")
    df.withColumn("shard",
      pmod(Hashes.portableHash32(col(idCol).cast("string")), lit(nShards.toLong)))
  }

  /** Group-aware k-fold assignment (GroupKFold): fold =
    * portable-hash(group) mod k, so EVERY row of a group lands in the
    * same fold — the cross-validation split that respects leakage
    * boundaries (near-dup cluster ids, domains, users): evaluating fold
    * i against the rest never sees fold i's groups in training. A pure
    * codegen'd projection — no shuffle, reproducible across runs and
    * engines (same md5 contract as [[deterministicSample]]). Fold sizes
    * are uniform in expectation over GROUPS, not rows: one giant group
    * still dominates its fold, which is the semantics leakage-safety
    * requires (check with [[graft.operators.Stats.keySkewProfile]] before
    * trusting the balance). */
  def groupKFold(df: DataFrame, groupCol: String, k: Int): DataFrame = {
    require(k > 1, "k > 1")
    df.withColumn("fold",
      pmod(Hashes.portableHash32(col(groupCol).cast("string")), lit(k.toLong)))
  }

  /** Neyman-optimal allocation of a fixed sample budget across strata:
    * n_h ∝ N_h·σ_h — the survey-sampling rule that minimizes the variance
    * of the estimated population mean under a total-budget constraint,
    * i.e. how many eval/audit samples each source deserves (big AND
    * internally-varied strata get more; a large but uniform stratum needs
    * few). The alternative every pipeline starts with — proportional
    * allocation — over-samples homogeneous strata; this is the
    * measured fix.
    *
    * One scan computes per-stratum EXACT integer moments (count, Σv, Σv²
    * — `valueCol` is cast to long: the metric is expected integer-valued,
    * e.g. chars/tokens/bytes); σ and the weight products are derived on
    * the driver from the collected |strata|-row frame (bounded
    * control-plane collect, the [[graft.operators.EventOps.markovAttribution]]
    * contract), with the weight total folded in ASCENDING stratum order so
    * the oracle's ordered list_sum replays every double. Integer
    * allocations use largest-remainder rounding (floor everything, then
    * +1 to the largest fractional parts, ties by stratum) so they sum to
    * the budget EXACTLY. Zero-variance strata get weight 0 — the pure
    * Neyman rule; pad floors externally if every stratum must appear.
    * Degenerate all-zero-variance input (total weight 0) allocates 0
    * everywhere and spends NOTHING — there is no variance to minimize,
    * and the remainder bump is skipped so the zero-weight rule is not
    * silently violated by +1s that would neither sum to the budget nor
    * mean anything; fall back to proportional allocation explicitly if
    * the budget must be spent regardless. */
  def neymanAllocation(df: DataFrame, stratumCol: String, valueCol: String,
                       budget: Long): DataFrame = {
    require(budget >= 0, "budget >= 0")
    val moments = df.filter(col(valueCol).isNotNull)
      .groupBy(col(stratumCol).cast("string").as("stratum"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col(valueCol).cast("long")).as("s1"),
        sum(col(valueCol).cast("long") * col(valueCol).cast("long")).as("s2"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val weighted = moments.map { case (st, n, s1, s2) =>
      val nd = n.toDouble
      val variance = math.max(0.0, (s2.toDouble - s1.toDouble * s1.toDouble / nd) / nd)
      val sd = math.sqrt(variance)
      (st, n, sd, nd * sd)
    }
    val tw = weighted.foldLeft(0.0)(_ + _._4) // ascending-stratum fold
    val raw = weighted.map { case (st, n, sd, w) =>
      val share = if (tw > 0) budget.toDouble * w / tw else 0.0
      (st, n, sd, math.floor(share).toLong, share - math.floor(share))
    }
    // tw == 0: every share is 0 by rule — bumping would hand the budget
    // to the alphabetically-first strata for no reason (ADVICE r11)
    val remainder = if (tw > 0) budget - raw.map(_._4).sum else 0L
    val bump = raw.sortBy { case (st, _, _, _, frac) => (-frac, st) }
      .take(math.max(0L, math.min(remainder, raw.length.toLong)).toInt)
      .map(_._1).toSet
    val spark = df.sparkSession
    import spark.implicits._
    raw.map { case (st, n, sd, fl, _) =>
      (st, n, sd, fl + (if (bump(st)) 1L else 0L))
    }.toSeq.toDF("stratum", "n_rows", "__sd", "alloc")
      .select(col("stratum"), col("n_rows"),
        round(col("__sd"), 4).as("stddev"), col("alloc"))
  }

  /** Per-shard export manifest: row count and id range per shard (what a
    * training loader checks before consuming the shards). */
  def shardManifest(df: DataFrame, idCol: String, nShards: Int): DataFrame =
    shardAssign(df, idCol, nShards)
      .groupBy(col("shard"))
      .agg(count(lit(1)).cast("long").as("n_rows"),
        min(col(idCol)).as("min_id"), max(col(idCol)).as("max_id"))

  /** Weight-balanced shard assignment: docs ranked heaviest-first and
    * dealt round-robin across `nShards` — the classic sorted/round-robin
    * bin packing whose max-shard excess over perfect balance is bounded
    * by one document, vs the unbounded skew [[shardAssign]]'s pure hash
    * dealing allows when token counts are heavy-tailed (one shard catching
    * two book-length docs while another gets tweets). This is how training
    * shards stay byte-balanced so no data-loader rank straggles.
    *
    * The global heaviest-first rank rides [[Stats.globalRank]]'s
    * range-partitioned contract (never a single-partition window);
    * weights enter negated to use its ascending order. */
  def balancedShards(df: DataFrame, idCol: String, weightCol: String,
                     nShards: Int, nRanges: Int = 64): DataFrame =
    Stats.globalRank(
      df.select(col(idCol), col(weightCol),
        negate(col(weightCol).cast("long")).as("__negw")),
      "__negw", idCol, nRanges)
      .withColumn("shard", ((col("global_rank") - 1) % nShards).cast("long"))
      .drop("__negw")

  /** Per-shard manifest for [[balancedShards]]: row count and total /
    * extreme weights — the balance audit (max(sum_weight)/min(sum_weight)
    * across rows should sit near 1). */
  def balancedShardReport(df: DataFrame, idCol: String, weightCol: String,
                          nShards: Int, nRanges: Int = 64): DataFrame =
    balancedShards(df, idCol, weightCol, nShards, nRanges)
      .groupBy(col("shard"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col(weightCol).cast("long")).cast("long").as("sum_weight"),
        min(col(weightCol).cast("long")).as("min_weight"),
        max(col(weightCol).cast("long")).as("max_weight"))

  /** Exactly `perStratum` rows per stratum, selected in id-hash order (a
    * deterministic stand-in for uniform-without-replacement). One shuffle on
    * the stratum key; rank is a window over each stratum only. */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
                       perStratum: Int): DataFrame = {
    val h = Hashes.portableHash32(col(idCol).cast("string"))
    val w = Window.partitionBy(col(strataCol)).orderBy(h, col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= perStratum)
      .drop("__rk")
  }

  /** [[stratifiedSample]]'s scale path: the same deterministic k-per-stratum
    * sample computed by the bounded [[graft.functions.TopKAgg]] instead of a
    * window. The window formulation SHUFFLES EVERY ROW to sort each stratum;
    * here map-side partial aggregation reduces each input partition to at
    * most k candidates per stratum before the (tiny) merge — at 10^10 rows
    * and k=1000 that's the difference between shuffling the corpus and
    * shuffling k x partitions rows. Returns (strata, id, sample_rank),
    * hash-ordered like the window variant. */
  def samplePerGroup(df: DataFrame, strataCol: String, idCol: String,
                     k: Int): DataFrame = {
    graft.functions.TopKAgg.register(df.sparkSession)
    val keyed = struct(
      Hashes.portableHash32(col(idCol).cast("string")).as("h"),
      col(idCol).as("id"))
    df.groupBy(col(strataCol))
      .agg(graft.functions.TopKAgg.topK(keyed, k).as("arr"))
      .select(col(strataCol), posexplode(col("arr")))
      .select(col(strataCol), col("col.id").as(idCol),
        (col("pos") + 1).as("sample_rank"))
  }

  /** Leakage-safe train/val/test split: membership is decided PER NEAR-DUP
    * COMPONENT, never per document — a near-dup pair straddling train and
    * eval is test-set contamination by construction, so every member of a
    * [[graft.operators.Dedup.connectedComponents]] cluster lands in the
    * same split. Docs absent from `components` (no near-dup link) are
    * their own singleton component. The id column keeps its NATIVE type
    * throughout (numeric or string — the hash input is its string form, so
    * a VARCHAR doc id buckets exactly like a BIGINT one; no lossy cast
    * that could null the component). The split is the component id's
    * portable hash bucket against cumulative weight thresholds —
    * deterministic, engine-reproducible, and a pure projection after one
    * equi-join on the id (broadcast when the component table is small;
    * shuffle on the id otherwise — never on the component). Returns
    * (id, component_id, split). */
  def leakageSafeSplit(docs: DataFrame, components: DataFrame, idCol: String,
                       splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0) &&
      math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split weights must be positive and sum to 1")
    val joined = docs.select(col(idCol))
      .join(components.select(col("node").as(idCol), col("component")),
        Seq(idCol), "left")
      .withColumn("component_id",
        coalesce(col("component"), col(idCol)))
    val bucket = pmod(Hashes.portableHash32(col("component_id").cast("string")),
      lit(10000L))
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(w => math.round(w * 10000))
    val splitCol = splits.map(_._1).zip(cum).init
      .foldRight(lit(splits.last._1): org.apache.spark.sql.Column) {
        case ((name, th), acc) => when(bucket < th, lit(name)).otherwise(acc)
      }
    joined.select(col(idCol), col("component_id"), splitCol.as("split"))
  }

  /** Split-leakage audit: for each candidate split ASSIGNMENT, how many
    * verified near-dup pairs straddle two different splits — the number
    * that must be ZERO for the split protecting an eval set
    * ([[leakageSafeSplit]]'s whole reason to exist) and is substantially
    * nonzero for a naive per-document hash split on any corpus with
    * duplicate families. Run it to PROVE the split held, not assume it.
    *
    * Per method: two id-equi-joins of the pair table against the
    * assignment (hash joins on the doc id — the assignment is corpus-sized,
    * so this shuffles on the id, never on the component), one 1-row count
    * aggregate. Output is |methods| rows. */
  def splitLeakageAudit(pairs: DataFrame, idA: String, idB: String,
                        assignments: Seq[(String, DataFrame)],
                        idCol: String): DataFrame = {
    require(assignments.nonEmpty, "at least one assignment")
    assignments.map { case (method, asg) =>
      val a = asg.select(col(idCol).as(idA), col("split").as("__sa"))
      val b = asg.select(col(idCol).as(idB), col("split").as("__sb"))
      pairs.join(a, idA).join(b, idB)
        .agg(count(lit(1)).cast("long").as("n_pairs"),
          sum(when(col("__sa") =!= col("__sb"), 1L).otherwise(0L))
            .cast("long").as("n_cross_pairs"))
        .select(lit(method).as("method"), col("n_pairs"),
          col("n_cross_pairs"),
          round(col("n_cross_pairs").cast("double") /
            col("n_pairs").cast("double"), 6).as("leakage_frac"))
    }.reduce(_ unionByName _)
  }

  /** Source-weighted mixture sampling — the "mix datasets at given ratios"
    * step of a training pipeline: keep ~`weights(source)` of each source's
    * rows, chosen by id-hash so membership is reproducible and externally
    * recomputable. Sources absent from `weights` are dropped. One codegen'd
    * filter, no shuffle, pushdown-friendly. */
  def mixtureSample(df: DataFrame, srcCol: String, idCol: String,
                    weights: Map[String, Double]): DataFrame = {
    require(weights.values.forall(w => w >= 0 && w <= 1), "weights in [0,1]")
    val bucket = pmod(Hashes.portableHash32(col(idCol).cast("string")), lit(10000L))
    val threshold = weights.foldLeft(lit(0.0)) { case (other, (s, w)) =>
      when(col(srcCol) === s, lit(math.round(w * 10000).toDouble)).otherwise(other)
    }
    df.filter(bucket < threshold)
  }

  /** Temperature-weighted mixture resampling — the multilingual-pretraining
    * rebalance (XLM-R style): source s is sampled with probability
    * proportional to `n_s^alpha`, so alpha=1 keeps natural proportions,
    * alpha=0 samples sources uniformly, and alpha=0.5 (the gated operating
    * point) up-weights small sources by the square root. Targets a total of
    * ~`targetRows` kept rows.
    *
    * Determinism across engines is ENGINEERED, not assumed: the weight is
    * quantized to an integer (`floor(n_s^alpha * 1000)`), so the weight
    * total and every per-source keep threshold are exact BIGINT arithmetic
    * — no order-dependent double summation can flip a threshold by one ulp
    * (contrast with summing raw `pow` values, where the fold order changes
    * the last bit). Membership is then the usual id-hash permille filter.
    * The source-stats frame is dimension-sized: one tiny aggregation, a
    * broadcast join back, one codegen'd filter over the corpus — the
    * corpus itself never shuffles. Returns per-source accounting
    * (n_docs, permille, n_kept). */
  def temperatureMix(df: DataFrame, srcCol: String, idCol: String,
                     alpha: Double, targetRows: Long): DataFrame = {
    require(alpha >= 0 && alpha <= 1, "alpha in [0,1]")
    require(targetRows > 0, "targetRows > 0")
    val counts = df.groupBy(col(srcCol))
      .agg(count(lit(1)).as("n"))
      .withColumn("w",
        floor(pow(col("n").cast("double"), lit(alpha)) * 1000.0).cast("long"))
    val tot = counts.agg(sum(col("w")).as("wtot"))
    val rates = counts.crossJoin(broadcast(tot))
      .withColumn("permille",
        least(lit(10000L),
          expr(s"($targetRows * w * 10000) div (wtot * n)")).cast("long"))
      .select(col(srcCol), col("n"), col("permille"))
    val bucket = pmod(Hashes.portableHash32(col(idCol).cast("string")), lit(10000L))
    df.select(col(srcCol), col(idCol))
      .join(broadcast(rates), Seq(srcCol))
      .groupBy(col(srcCol))
      .agg(max(col("n")).cast("long").as("n_docs"),
        max(col("permille")).as("permille"),
        sum(when(bucket < col("permille"), 1L).otherwise(0L)).cast("long")
          .as("n_kept"))
  }

  /** Sequence packing: assign documents to fixed-token-budget training packs.
    *
    * Within each `groupCol` partition, documents ordered by `orderCol`
    * accumulate tokens; `pack_id = floor(exclusive_prefix_sum / budget)` —
    * the streaming-friendly deterministic approximation of greedy packing
    * (a doc larger than the budget gets its own pack(s) boundary-aligned).
    * One shuffle on the group key; the prefix sum is a window running total. */
  def packByTokenBudget(df: DataFrame, groupCol: String, orderCol: String,
                        tokenCountCol: Column, budget: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__tokens", tokenCountCol.cast("long"))
      .withColumn("__before", coalesce(sum(col("__tokens")).over(w), lit(0L)))
      .withColumn("pack_id", floor(col("__before") / budget))
      .withColumn("pack_offset", col("__before") % budget)
      .drop("__before")
      .withColumnRenamed("__tokens", "n_tokens")
  }

  /** Packing-efficiency report over [[packByTokenBudget]]'s continuous
    * filling: per group, the pack count, total tokens, the fill fraction
    * (only each group's LAST pack can be partial under continuous filling
    * — fill_frac isolates that tail loss), and the share of documents that
    * CROSS a pack boundary (`pack_offset + n_tokens > budget`) — the
    * number that decides whether a training setup needs cross-pack
    * attention masking or should switch to non-splitting bin packing.
    *
    * One window pass (the packer's own per-group cumulative sum) plus one
    * group-key aggregate; output is |groups| rows. */
  def packingReport(df: DataFrame, groupCol: String, orderCol: String,
                    tokenCountCol: Column, budget: Int): DataFrame = {
    val packed = packByTokenBudget(df, groupCol, orderCol, tokenCountCol,
      budget)
    packed.groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("n_tokens")).cast("long").as("total_tokens"),
        (max(col("pack_id")) + 1).cast("long").as("n_packs"),
        sum(when(col("pack_offset") + col("n_tokens") > budget, 1L)
          .otherwise(0L)).cast("long").as("n_spanning"))
      .select(col(groupCol), col("n_docs"), col("total_tokens"),
        col("n_packs"),
        round(col("total_tokens").cast("double") /
          (col("n_packs").cast("double") * budget), 6).as("fill_frac"),
        col("n_spanning"),
        round(col("n_spanning").cast("double") /
          col("n_docs").cast("double"), 6).as("span_frac"))
  }

  /** Weighted sampling WITHOUT replacement — Efraimidis–Spirakis A-ES
    * ("Weighted random sampling with a reservoir", IPL 2006): each row gets
    * key u^(1/w) for uniform u, and the k largest keys are a PPS-correct
    * weighted sample. Ordering by ln(u)/w (monotone in u^(1/w), numerically
    * tamer) with the uniform derived from the row id's portable hash —
    * u = (h + 0.5) / 2^32 — so the sample is deterministic, reproducible on
    * any cluster size, and externally recomputable, the same contract as
    * [[deterministicSample]]. Selection is the bounded
    * [[graft.functions.TopKAgg]]: every partition emits at most k
    * candidates map-side, a single tiny merge picks the winners — no global
    * sort, no shuffle of the corpus. Rows with null or non-positive weight
    * are excluded (zero-weight items are never sampled in A-ES).
    * Returns (sample_rank, id, aes_key) with aes_key = ln(u)/w 6dp. */
  /** Token-budget-capped mixture fill — the "take N tokens per source"
    * stage of assembling a training mix: docs are ordered per source by the
    * deterministic portable hash (an unbiased shuffle any engine replays),
    * and each source keeps its prefix while the running token sum stays
    * within that source's budget. Sources absent from `budgets` are dropped
    * entirely. The running sum is one per-source window — same per-group
    * ordering contract as [[stratifiedSample]]; at extreme per-source
    * cardinality, range-partition each source and prefix-stitch the partial
    * sums exactly as `Stats.sequenceGaps` does for its id ranges. */
  def tokenBudgetSample(df: DataFrame, srcCol: String, idCol: String,
                        tokenCol: String,
                        budgets: Map[String, Long]): DataFrame = {
    val w = Window.partitionBy(col(srcCol))
      .orderBy(graft.functions.Hashes.portableHash32(col(idCol).cast("string")),
        col(idCol))
    df.withColumn("cum_tokens", sum(col(tokenCol)).over(w))
      .filter(col("cum_tokens") <=
        element_at(typedLit(budgets), col(srcCol)))
      .select(col(idCol), col(srcCol), col(tokenCol), col("cum_tokens"))
  }

  /** Water-filling token allocation: the max-proportional mixture plan when
    * some sources cannot supply their target share. [[epochMixPlan]] holds
    * each source's target fixed and reports deficits; this operator
    * REDISTRIBUTES capped sources' shortfall to the sources that still have
    * supply, solving for the highest water level `T` with
    * `Σ min(capacity_s, weight_s · T) = budget` — a source is saturated
    * (gives everything) iff `capacity_s / weight_s ≤ T`, everyone else
    * contributes proportionally at level `T`.
    *
    * Exact greedy in one pass over the |sources|-row capacity frame: sorted
    * by the saturation ratio ascending, the saturated set is a PREFIX, and
    * row k is saturated iff
    * `cap_k · (W − cumW_prev) ≤ w_k · (B − cumC_prev)` with exclusive
    * prefix sums over ALL prior rows (prior rows are exactly the saturated
    * ones inside the prefix, and once the test fails it fails for every
    * later row — f(k) decreases past the boundary while ratios increase).
    * The level itself then comes from the saturated totals via one
    * conditional aggregate. Shuffle cost: one map-side-combined groupBy
    * over the corpus for capacities; everything after runs on |sources|
    * rows (the unpartitioned ratio-order window is bounded by the source
    * count, not rows — same contract as the curriculum-bin value frame).
    * Allocations floor() to whole tokens (engine-portable, same rule as
    * [[epochMixPlan]]); budgets beyond total capacity saturate every source
    * and report a null water level. */
  def waterFillAllocation(df: DataFrame, srcCol: String, tokenCol: String,
                          weights: Map[String, Double],
                          budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, "budgetTokens > 0")
    require(weights.values.forall(_ > 0), "weights > 0")
    val caps = df.groupBy(col(srcCol))
      .agg(sum(col(tokenCol)).cast("double").as("cap"))
      .withColumn("weight", element_at(typedLit(weights), col(srcCol)))
      .filter(col("weight").isNotNull && col("cap") > 0)
      .withColumn("ratio", col("cap") / col("weight"))
    val wOrd = Window.orderBy(col("ratio"), col(srcCol))
    val wPrev = wOrd.rowsBetween(Window.unboundedPreceding, -1)
    val wAll = wOrd.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val flagged = caps
      .withColumn("cum_c", coalesce(sum(col("cap")).over(wPrev), lit(0.0)))
      .withColumn("cum_w", coalesce(sum(col("weight")).over(wPrev), lit(0.0)))
      .withColumn("tot_w", sum(col("weight")).over(wAll))
      .withColumn("saturated",
        col("cap") * (col("tot_w") - col("cum_w")) <=
          col("weight") * (lit(budgetTokens.toDouble) - col("cum_c")))
    val level = flagged.agg(
      sum(when(col("saturated"), col("cap")).otherwise(0.0)).as("__sc"),
      sum(when(col("saturated"), col("weight")).otherwise(0.0)).as("__sw"),
      max(col("tot_w")).as("__tw"))
      .select(when(col("__tw") > col("__sw"),
        (lit(budgetTokens.toDouble) - col("__sc")) /
          (col("__tw") - col("__sw"))).as("__level"))
    flagged.crossJoin(broadcast(level))
      .select(col(srcCol), col("weight"),
        col("cap").cast("long").as("capacity_tokens"),
        round(col("ratio"), 2).as("saturation_ratio"),
        col("saturated"),
        when(col("saturated"), col("cap"))
          .otherwise(floor(col("weight") * col("__level")))
          .cast("long").as("alloc_tokens"),
        round(when(col("saturated"), lit(1.0))
          .otherwise(col("weight") * col("__level") / col("cap")), 6)
          .as("fill_frac"),
        round(col("__level"), 2).as("water_level"))
  }

  /** Epoch-aware mixture plan — the "how many passes over each source fills
    * the token budget at the target mix" calculation (the repetition
    * schedule of LLaMA/DoReMi-style data mixing, where small high-weight
    * sources are repeated up to `maxEpochs` and the shortfall is reported
    * rather than silently re-filled).
    *
    * Per weighted source: `target = floor(budget · weight)` tokens wanted;
    * `planned = min(target, floor(size · maxEpochs))` tokens actually
    * schedulable; `epochs = planned / size` passes; `deficit = target −
    * planned` what the cap refuses. Sources without a weight drop out
    * (weights need not sum to 1 — caller's contract).
    *
    * One map-side-combined groupBy over the corpus (per-source token sums),
    * then constant-space arithmetic on the group rows: the output is
    * |sources| rows regardless of corpus size, so the plan is a single
    * shuffle of partial sums at any scale. floor() (not a double→long cast)
    * on both engine sides: Spark's cast truncates while DuckDB's rounds,
    * and `budget · weight` lands on x.9999… for non-dyadic weights. */
  def epochMixPlan(df: DataFrame, srcCol: String, tokenCol: String,
                   weights: Map[String, Double], budgetTokens: Long,
                   maxEpochs: Double = 4.0): DataFrame = {
    require(budgetTokens > 0, "budgetTokens > 0")
    require(maxEpochs > 0, "maxEpochs > 0")
    val w = element_at(typedLit(weights), col(srcCol))
    df.groupBy(col(srcCol))
      .agg(sum(col(tokenCol)).cast("long").as("n_tokens"))
      .withColumn("weight", w)
      .filter(col("weight").isNotNull && col("n_tokens") > 0)
      .withColumn("target_tokens",
        floor(lit(budgetTokens.toDouble) * col("weight")).cast("long"))
      .withColumn("planned_tokens",
        least(col("target_tokens"),
          floor(col("n_tokens").cast("double") * lit(maxEpochs)).cast("long")))
      .withColumn("epochs",
        round(col("planned_tokens").cast("double") /
          col("n_tokens").cast("double"), 4))
      .withColumn("deficit_tokens",
        col("target_tokens") - col("planned_tokens"))
      .select(col(srcCol), col("n_tokens"), col("weight"),
        col("target_tokens"), col("planned_tokens"), col("epochs"),
        col("deficit_tokens"))
  }

  /** Per-stratum weighted sample without replacement: the k highest
    * A-ES keys (Efraimidis–Spirakis `log(u)/w`, u from the portable id
    * hash) WITHIN each stratum — "k docs per language, weighted by
    * quality" in one pass. Same reproducibility contract as
    * [[weightedSample]] (any engine can recompute membership), same
    * bounded state as [[samplePerGroup]]: the per-stratum top-k rides the
    * map-side-partial [[graft.functions.TopKAgg]], so no stratum's
    * candidate set is ever sorted or collected whole. */
  def groupWeightedSample(df: DataFrame, strataCol: String, idCol: String,
                          weightCol: String, k: Int): DataFrame = {
    require(k > 0, "k > 0")
    graft.functions.TopKAgg.register(df.sparkSession)
    val u = (Hashes.portableHash32(col(idCol).cast("string")).cast("double")
      + lit(0.5)) / lit(4294967296.0)
    val key = log(u) / col(weightCol).cast("double")
    val keyed = struct(negate(key).as("nk"), col(idCol).as("id"))
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .groupBy(col(strataCol))
      .agg(graft.functions.TopKAgg.topK(keyed, k).as("arr"))
      .select(col(strataCol), posexplode(col("arr")))
      .select(col(strataCol), (col("pos") + 1).cast("long").as("sample_rank"),
        col("col.id").as(idCol),
        round(negate(col("col.nk")), 6).as("aes_key"))
  }

  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int): DataFrame = {
    graft.functions.TopKAgg.register(df.sparkSession)
    val u = (Hashes.portableHash32(col(idCol).cast("string")).cast("double")
      + lit(0.5)) / lit(4294967296.0)
    val key = log(u) / col(weightCol).cast("double")
    // TopKAgg keeps the k SMALLEST by first struct field: negate the key so
    // "largest key" (A-ES winner) sorts first; ties (impossible for
    // distinct ids in practice) break by id ascending
    val keyed = struct(negate(key).as("nk"), col(idCol).as("id"))
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .agg(graft.functions.TopKAgg.topK(keyed, k).as("arr"))
      .select(posexplode(col("arr")))
      .select((col("pos") + 1).cast("long").as("sample_rank"),
        col("col.id").as(idCol),
        round(negate(col("col.nk")), 6).as("aes_key"))
  }

  /** Cold-start exposure report for a hash split: how much of the TEST
    * side rides entities the TRAIN side never saw. A recommender / ranking
    * eval where most test events hit known entities overstates production
    * quality exactly where it matters (new users, new items); this report
    * is the one-row honesty check run before quoting the metric. The
    * leakage-family complement of [[leakageSafeSplit]]: that one keeps
    * near-dups from straddling splits, this one MEASURES how much genuine
    * novelty the split left in the eval.
    *
    * Split = portable-hash(`rowIdCol`) mod `testMod` == 0 (deterministic,
    * replayable). Unseen = test entities absent from the train side
    * (one left-anti on the distinct entity sets — broadcast when small,
    * shuffle otherwise, Catalyst's call). All counts exact integers. */
  def coldStartReport(df: DataFrame, rowIdCol: String, entityCol: String,
                      testMod: Int = 5): DataFrame = {
    require(testMod >= 2, "testMod >= 2")
    val base = df.filter(col(rowIdCol).isNotNull && col(entityCol).isNotNull)
      .select(col(entityCol).as("e"),
        (pmod(Hashes.portableHash32(col(rowIdCol).cast("string")),
          lit(testMod.toLong)) === 0).as("is_test"))
      .localCheckpoint() // feeds both sides + the event recount
    val trainEnts = base.filter(!col("is_test")).select("e").distinct()
    val testEnts = base.filter(col("is_test")).select("e").distinct()
    val unseen = testEnts.join(trainEnts, Seq("e"), "left_anti")
      .localCheckpoint() // counted AND joined back
    val testEvents = base.filter(col("is_test"))
    val counts = testEvents.agg(count(lit(1)).as("n_test_events"))
      .crossJoin(broadcast(testEnts.agg(count(lit(1)).as("n_test_entities"))))
      .crossJoin(broadcast(unseen.agg(count(lit(1)).as("n_unseen_entities"))))
      .crossJoin(broadcast(testEvents.join(unseen, Seq("e"), "left_semi")
        .agg(count(lit(1)).as("n_unseen_events"))))
    counts.select(col("n_test_events").cast("long").as("n_test_events"),
      col("n_test_entities").cast("long").as("n_test_entities"),
      col("n_unseen_entities").cast("long").as("n_unseen_entities"),
      round(col("n_unseen_entities").cast("double") /
        col("n_test_entities"), 6).as("unseen_entity_share"),
      round(col("n_unseen_events").cast("double") /
        col("n_test_events"), 6).as("unseen_event_share"))
  }

  /** Deterministic uniform negative sampling for contrastive training:
    * for every interacting user, draw `k` candidate items by portable
    * hash (`h32(user:slot) mod |catalog|` against a dense catalog index),
    * then anti-join the user's POSITIVES away — the standard
    * two-tower/contrastive negatives pass, reproducible on any cluster
    * size and re-runnable to the same pairs (a `rand()` version re-rolls
    * per retry and poisons the training cache). Slots that collide with
    * a positive are DROPPED, not re-probed (documented semantics: with
    * |positives| ≪ |catalog| the loss is ~|pos|/|catalog| per slot;
    * re-probing would make each row's output depend on the whole
    * positive set and break the pure-projection shape).
    *
    * Scale: candidates are a k× map-side expansion of the USER list; the
    * catalog index (row_number over the catalog order) is catalog-sized
    * — broadcast it; the only shuffles are the distinct on positives and
    * the anti-join on (user, item). */
  def negativeSampling(positives: DataFrame, userCol: String,
                       itemCol: String, catalog: DataFrame,
                       catalogKey: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 1024, "k in [1, 1024]")
    val pos = positives
      .select(col(userCol).as("u"), col(itemCol).as("it")).distinct()
      .localCheckpoint() // read twice: user list + anti-join side
    val cat = catalog
      .select(col(catalogKey).as("it"))
      .withColumn("idx",
        row_number().over(Window.orderBy(col("it"))).cast("long") - 1)
    val n = catalog.agg(count(lit(1)).as("n_items"))
    val cand = pos.select(col("u")).distinct()
      .withColumn("slot", explode(sequence(lit(0), lit(k - 1))))
      .crossJoin(broadcast(n))
      .withColumn("idx", pmod(Hashes.portableHash32(
        concat(col("u").cast("string"), lit(":"),
          col("slot").cast("string"))), col("n_items")))
      .join(broadcast(cat), Seq("idx"))
    cand.join(pos, Seq("u", "it"), "left_anti")
      .select(col("u").as(userCol), col("slot").cast("long").as("slot"),
        col("it").as(s"neg_$catalogKey"))
  }

  /** Shuffle-quality audit of the training order a deterministic shard +
    * hash shuffle would feed the loader: documents land in
    * `pmod(h(id), nShards)` shards, are read within each shard in
    * position-hash order, and the report measures per-source ADJACENCY —
    * how often a doc's predecessor has the same source, vs the source's
    * overall share. `lift` ≈ 1 is a healthy shuffle; lift ≫ 1 means
    * same-source runs survive into training batches (the gradient-
    * correlation smell), lift ≪ 1 an anti-correlated (suspicious)
    * interleave. The check every "we globally shuffled, trust us"
    * pipeline should ship.
    *
    * Scale shape: both hashes are one md5 per row; the only window is
    * PARTITIONED by shard (each slice is corpus/nShards); counts are
    * exact integers, rates single divisions, lift the one
    * division-of-divisions written identically in the oracle. Position
    * salt differs from the shard salt, so shard and order are
    * independent streams of the same portable hash. */
  def shardMixingReport(df: DataFrame, idCol: String, srcCol: String,
                        nShards: Int): DataFrame = {
    require(nShards >= 2 && nShards <= (1 << 20), "nShards in [2, 2^20]")
    val h = graft.functions.Hashes
    val base = df.select(col(idCol).cast("string").as("id"),
      col(srcCol).as("src"))
      .withColumn("shard", pmod(h.portableHash32(col("id")),
        lit(nShards.toLong)))
      .withColumn("ph", h.portableHash32(concat(lit("pos:"), col("id"))))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("ph"), col("id"))
    val adj = base.withColumn("prev", lag(col("src"), 1).over(w))
    val per = adj.groupBy(col("src"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(when(col("prev").isNotNull, 1L).otherwise(0L)).cast("long")
          .as("n_follow"),
        sum(when(col("prev") === col("src"), 1L).otherwise(0L)).cast("long")
          .as("adjacent_same"))
    val tot = per.agg(sum(col("n_docs")).cast("long").as("n_total"))
    per.crossJoin(broadcast(tot))
      .select(col("src").as(srcCol), col("n_docs"), col("n_follow"),
        col("adjacent_same"),
        round(col("adjacent_same").cast("double") /
          col("n_follow").cast("double"), 4).as("adj_rate"),
        round(col("n_docs").cast("double") /
          col("n_total").cast("double"), 4).as("share"),
        round((col("adjacent_same").cast("double") /
          col("n_follow").cast("double")) /
          (col("n_docs").cast("double") / col("n_total").cast("double")), 4)
          .as("lift"))
  }
}
