package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-shaped corpus statistics for training-data curation at scale:
  * approximate distinct counts and corpus-wide heavy hitters, both built so
  * the shuffled state is BOUNDED (registers / top-k buffers), never the value
  * set itself.
  *
  * The HLL here is deliberately a *portable deterministic* HyperLogLog over
  * the md5-derived hash (same rationale as [[graft.functions.Hashes]]): every
  * step — register index, leading-zero rank, the register max, the harmonic
  * total, the small-range correction — is integer-exact or a single IEEE
  * operation, so an external engine replays it bit-for-bit and the estimate
  * is reproducible across engines and runs. Spark's own `approx_count_distinct`
  * (HLL++) and `hll_sketch_agg` (DataSketches) trade that reproducibility for
  * speed; at 100 TB you'd reach for them when cross-engine determinism is not
  * a requirement — the SHAPE (bounded register state, map-side partial merge)
  * is identical.
  */
object Sketches {

  /** Register-index bit count for m registers (m a power of two). */
  def hllRegBits(m: Int): Int = Integer.numberOfTrailingZeros(m)

  /** Max leading-zero rank: the non-register bits of the 60-bit hash + 1. */
  def hllMaxRho(m: Int): Int = (60 - hllRegBits(m)) + 1

  /** `alpha_m * m^2 * 2^maxRho` — the numerator of the scaled-integer
    * harmonic estimate. Public so the external oracle can interpolate the
    * IDENTICAL double instead of re-deriving it. */
  def hllScaleC(m: Int): Double =
    0.7213 / (1.0 + 1.079 / m) * m * m * math.pow(2.0, hllMaxRho(m))

  /** Deterministic HyperLogLog distinct estimate per group.
    *
    * Hash = first 15 md5 hex chars (60 bits, non-negative); low `log2(m)`
    * bits pick the register, the remaining bits' leading-zero rank (rho) is
    * the register value. The per-group state after the first aggregation is
    * at most `m` rows — map-side partial `max` means each input partition
    * shuffles at most `m` rows per group no matter how many values it holds;
    * the classic exact `countDistinct` instead shuffles every distinct value.
    * The harmonic mean runs in SCALED INTEGER arithmetic (sum of
    * `2^(maxRho - rho)` as BIGINT) so it is order-independent and exact —
    * only the final division and the `ln` of the small-range correction are
    * floating point, each a single well-defined IEEE operation.
    *
    * Output: groupCols..., `exact_distinct` (for error inspection — drop it
    * at scale), `hll_distinct` (rounded 2dp).
    */
  def hllDistinct(df: DataFrame, valueCol: String, groupCols: Seq[String],
                  m: Int = 256): DataFrame = {
    require(m >= 16 && (m & (m - 1)) == 0, s"m must be a power of two >= 16, got $m")
    require(groupCols.nonEmpty, "grouping columns required")
    val regBits = hllRegBits(m)
    val maxRho = hllMaxRho(m) // rest has 60-regBits bits; rho = lz + 1
    val scaleC = hllScaleC(m)

    val gcols = groupCols.map(col)
    val h = conv(substring(md5(col(valueCol).cast("string")), 1, 15), 16, 10).cast("long")
    // nulls are excluded (countDistinct semantics); left in, a single null
    // value would null-poison the register sum and the whole estimate
    val hashed = df.filter(col(valueCol).isNotNull).select(gcols :+ h.as("h"): _*)
      .withColumn("reg", col("h").bitwiseAND(lit((m - 1).toLong)))
      .withColumn("rest", shiftright(col("h"), regBits))
      .withColumn("rho", when(col("rest") === 0, lit(maxRho))
        .otherwise(lit(maxRho) - length(bin(col("rest")))))
    val regs = hashed.groupBy(gcols :+ col("reg"): _*).agg(max(col("rho")).as("rho"))
    val grouped = regs.groupBy(gcols: _*).agg(
      count(lit(1)).as("np"),
      sum(call_function("shiftleft", lit(1L),
        lit(maxRho) - col("rho"))).as("scaled"))
    val total = (col("scaled") + (lit(m.toLong) - col("np")) *
      call_function("shiftleft", lit(1L), lit(maxRho))).cast("double")
    val eRaw = lit(scaleC) / total
    val zeros = lit(m.toLong) - col("np")
    val est = when(eRaw <= lit(2.5 * m) && zeros > 0,
      lit(m.toDouble) * log(lit(m.toDouble) / zeros)).otherwise(eRaw)
    val exact = df.groupBy(gcols: _*)
      .agg(countDistinct(col(valueCol)).cast("long").as("exact_distinct"))
    // exact drives (left join): a group whose values are ALL null has no
    // register rows, but must still appear with estimate 0 (countDistinct
    // semantics), not vanish
    exact
      .join(grouped.select(gcols :+ round(est, 2).as("h"): _*), groupCols, "left")
      .select(gcols ++ Seq(col("exact_distinct"),
        coalesce(col("h"), lit(0.0)).as("hll_distinct")): _*)
  }

  /** The MERGE property that makes HLL a 100 TB operator: per-group
    * register tables combine by per-register MAX into the sketch of the
    * UNION, so a rollup (per-source sketches -> corpus total) never
    * re-reads data — the per-group state from [[hllDistinct]] is all that
    * ever moves. This computes the per-`groupCols` registers (identical
    * pipeline), merges them by max, and estimates the global distinct from
    * the merged m-register sketch, returning one row of
    * (n_groups_merged, exact_distinct, hll_distinct). The merged estimate
    * is BY CONSTRUCTION equal to sketching the whole input directly (max
    * over groups of per-group maxima == the global maximum per register) —
    * which is exactly what the oracle checks from the other direction. */
  def hllMergedDistinct(df: DataFrame, valueCol: String, groupCols: Seq[String],
                        m: Int = 256): DataFrame = {
    require(m >= 16 && (m & (m - 1)) == 0, s"m must be a power of two >= 16, got $m")
    require(groupCols.nonEmpty, "grouping columns required")
    val regBits = hllRegBits(m)
    val maxRho = hllMaxRho(m)
    val scaleC = hllScaleC(m)
    val gcols = groupCols.map(col)
    val h = conv(substring(md5(col(valueCol).cast("string")), 1, 15), 16, 10).cast("long")
    val hashed = df.filter(col(valueCol).isNotNull).select(gcols :+ h.as("h"): _*)
      .withColumn("reg", col("h").bitwiseAND(lit((m - 1).toLong)))
      .withColumn("rest", shiftright(col("h"), regBits))
      .withColumn("rho", when(col("rest") === 0, lit(maxRho))
        .otherwise(lit(maxRho) - length(bin(col("rest")))))
    val groupRegs = hashed.groupBy(gcols :+ col("reg"): _*)
      .agg(max(col("rho")).as("rho"))
    // the merge itself: per-register MAX across the group sketches
    val merged = groupRegs.groupBy(col("reg")).agg(max(col("rho")).as("rho"))
    val est = merged.agg(
        count(lit(1)).as("np"),
        sum(call_function("shiftleft", lit(1L),
          lit(maxRho) - col("rho"))).as("scaled"))
      .select({
        val total = (col("scaled") + (lit(m.toLong) - col("np")) *
          call_function("shiftleft", lit(1L), lit(maxRho))).cast("double")
        val eRaw = lit(scaleC) / total
        val zeros = lit(m.toLong) - col("np")
        round(when(eRaw <= lit(2.5 * m) && zeros > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / zeros)).otherwise(eRaw), 2)
          .as("hll_distinct")
      })
    // distinct group TUPLES via struct, not a delimiter-joined string —
    // adversarial values containing the delimiter could merge two groups
    val nGroups = groupRegs
      .agg(countDistinct(struct(gcols: _*)).cast("long")
        .as("n_groups_merged"))
    val exact = df.agg(countDistinct(col(valueCol)).cast("long").as("exact_distinct"))
    nGroups.crossJoin(exact).crossJoin(est)
  }

  /** Count-Min sketch frequency estimates for a set of probe keys, with the
    * exact counts alongside (the sketch-error report a pipeline runs before
    * trusting CMS numbers at a given width).
    *
    * The sketch is `depth` independent md5-derived hash rows of `width`
    * counters — the shuffled state is the depth x width counter grid
    * (map-side partial counts), NEVER the key space, so the same code
    * sketches 10^10 keys into the same few-KB state; the estimate for a key
    * is the MIN of its `depth` counters (one-sided error: always >= exact,
    * overshoot ~ N/width per row, min over rows damps it — pick width for
    * the N you expect; the toy width here makes the overcount VISIBLE so
    * the gate actually checks the estimate algebra, not a lucky identity).
    * Probe keys enter as a literal frame; the sketch side is bounded so the
    * probe join broadcasts it. Every counter index is integer-exact md5
    * arithmetic, so an external engine replays the sketch bit-for-bit. */
  def cmsEstimate(df: DataFrame, keyCol: String, width: Int, depth: Int,
                  probeKeys: Seq[String]): DataFrame = {
    require(width > 0 && depth > 0 && probeKeys.nonEmpty, "width/depth/probes")
    val spark = df.sparkSession
    import spark.implicits._
    def bucket(k: Column, j: Column): Column =
      pmod(graft.functions.Hashes.portableHash32(
        concat(j.cast("string"), lit(":"), k)), lit(width.toLong))
    val keyed = df.filter(col(keyCol).isNotNull)
      .select(col(keyCol).cast("string").as("k"))
    val sketch = keyed
      .select(col("k"), explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .select(col("j"), bucket(col("k"), col("j")).as("b"))
      .groupBy("j", "b").agg(count(lit(1)).as("c"))
    val probes = probeKeys.toDF("key")
      .select(col("key"), explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .select(col("key"), col("j"), bucket(col("key"), col("j")).as("b"))
    // left join + coalesce: a probe key whose buckets are all empty is the
    // BEST case (estimate 0) and must not vanish from the report
    val est = probes.join(broadcast(sketch), Seq("j", "b"), "left")
      .groupBy("key")
      .agg(min(coalesce(col("c"), lit(0L))).cast("long").as("cms_est"))
    val exact = keyed.filter(col("k").isin(probeKeys: _*))
      .groupBy(col("k").as("key")).agg(count(lit(1)).cast("long").as("exact_n"))
    est.join(exact, Seq("key"), "left")
      .select(col("key"), coalesce(col("exact_n"), lit(0L)).as("exact_n"),
        col("cms_est"),
        (col("cms_est") - coalesce(col("exact_n"), lit(0L))).as("overcount"))
  }

  /** Equi-join cardinality estimate WITHOUT running the join — the
    * pre-flight that catches a key-skew output blowup (or proves a join
    * harmless) before committing a cluster to it: |A ⋈ B| = Σ_k a_k·b_k,
    * estimated by the Count-Min inner product — per depth row j,
    * Σ_bucket cmsA[j]·cmsB[j], then MIN over rows (one-sided like the
    * point estimate: never under the true size; AMS-style overshoot
    * ~|A|·|B|/width per row, damped by the min).
    *
    * Each side collapses to its depth×width counter grid (map-side
    * partial counts — the key space never shuffles); the inner product
    * joins two such grids on (row, bucket), a few-KB broadcast join.
    * The exact size is computed alongside from the two per-key count
    * tables (one group-key shuffle each, joined on the key — still never
    * materializing the join output), so the gate checks the estimator's
    * algebra against the truth it predicts. */
  /** Estimator half of [[cmsJoinSizeEstimate]] — 1-row `est_join_rows`,
    * NO exact computation. This is what a real pre-flight runs
    * ([[joinPreflightCard]]); the public gate wraps it with the exact
    * truth column. */
  private[operators] def cmsJoinSizeEstimateOnly(
      left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String,
      width: Int, depth: Int): DataFrame = {
    require(width > 0 && depth > 0, "width/depth")
    def bucket(k: Column, j: Column): Column =
      pmod(graft.functions.Hashes.portableHash32(
        concat(j.cast("string"), lit(":"), k)), lit(width.toLong))
    def sketch(df: DataFrame, keyCol: String): DataFrame =
      df.filter(col(keyCol).isNotNull)
        .select(col(keyCol).cast("string").as("k"))
        .select(col("k"), explode(sequence(lit(0), lit(depth - 1))).as("j"))
        .select(col("j"), bucket(col("k"), col("j")).as("b"))
        .groupBy("j", "b").agg(count(lit(1)).as("c"))
    sketch(left, leftKey)
      .join(broadcast(sketch(right, rightKey)
        .withColumnRenamed("c", "c2")), Seq("j", "b"))
      .groupBy("j").agg(sum(col("c") * col("c2")).as("dotj"))
      .agg(min(col("dotj")).cast("long").as("est_join_rows"))
  }

  def cmsJoinSizeEstimate(left: DataFrame, leftKey: String,
                          right: DataFrame, rightKey: String,
                          width: Int, depth: Int): DataFrame = {
    val dot = cmsJoinSizeEstimateOnly(left, leftKey, right, rightKey,
      width, depth)
    val ca = left.filter(col(leftKey).isNotNull)
      .groupBy(col(leftKey).cast("string").as("k"))
      .agg(count(lit(1)).as("na"))
    val cb = right.filter(col(rightKey).isNotNull)
      .groupBy(col(rightKey).cast("string").as("k"))
      .agg(count(lit(1)).as("nb"))
    val exact = ca.join(cb, "k")
      .agg(coalesce(sum(col("na") * col("nb")), lit(0L)).cast("long")
        .as("exact_join_rows"))
    exact.crossJoin(dot)
      .withColumn("overcount",
        col("est_join_rows") - col("exact_join_rows"))
  }

  /** Join pre-flight CARD: the one-row decision artifact a planner reads
    * before committing a big join, combining every pre-flight this module
    * provides — per-side row counts, the CMS inner-product OUTPUT-size
    * estimate ([[cmsJoinSizeEstimate]]'s estimator half), the HLL
    * distinct-key overlap ([[hllKeyOverlap]]'s estimator half), per-side
    * top-key shares (the [[graft.operators.Stats.keySkewProfile]] signal
    * reduced to its decision bit), and the strategy the thresholds imply:
    * `broadcast_left`/`broadcast_right` when a side fits the broadcast
    * budget, `salt` when either side's hottest key exceeds the skew
    * share limit, else `shuffle_hash`.
    *
    * Every component is sketch- or count-bounded: two depth×width CMS
    * grids, three m-register HLL tables, two per-key count tables reduced
    * to (n, max) — nothing the size of the join output ever materializes,
    * and all seven 1-row frames cross-join broadcast into the card. The
    * per-side max-key-count is exact here (it is the oracle for the CMS
    * point estimate a 100 TB run would use instead); thresholds are
    * caller-owned knobs, the card just applies them deterministically. */
  def joinPreflightCard(left: DataFrame, leftKey: String,
                        right: DataFrame, rightKey: String,
                        cmsWidth: Int = 256, cmsDepth: Int = 3,
                        hllM: Int = 256,
                        broadcastRowLimit: Long = 100000L,
                        skewShareLimit: Double = 0.1): DataFrame = {
    def sideStats(df: DataFrame, keyCol: String, n: String, sh: String) =
      df.filter(col(keyCol).isNotNull)
        .groupBy(col(keyCol)).agg(count(lit(1)).as("c"))
        .agg(coalesce(sum(col("c")), lit(0L)).cast("long").as(n),
          coalesce(max(col("c")), lit(0L)).as("__mx"))
        .select(col(n), round(when(col(n) > 0,
          col("__mx").cast("double") / col(n).cast("double"))
          .otherwise(lit(0.0)), 6).as(sh))
    val la = sideStats(left, leftKey, "n_left", "left_top_share")
    val rb = sideStats(right, rightKey, "n_right", "right_top_share")
    val size = cmsJoinSizeEstimateOnly(left, leftKey, right, rightKey,
      cmsWidth, cmsDepth)
    val overlap = hllKeyOverlapEstimateOnly(left, leftKey, right, rightKey,
      hllM).select(col("est_overlap").as("est_overlap_keys"))
    la.crossJoin(broadcast(rb))
      .crossJoin(broadcast(size))
      .crossJoin(broadcast(overlap))
      .withColumn("strategy",
        when(col("n_right") <= broadcastRowLimit, lit("broadcast_right"))
          .when(col("n_left") <= broadcastRowLimit, lit("broadcast_left"))
          .when(greatest(col("left_top_share"), col("right_top_share"))
            > skewShareLimit, lit("salt"))
          .otherwise(lit("shuffle_hash")))
  }

  /** Distinct-key OVERLAP pre-flight for a join: |keys(A) ∩ keys(B)|
    * estimated by inclusion–exclusion over three HLL sketches —
    * est(A) + est(B) − est(A ∪ B) — where the union sketch is the
    * per-register MAX of the two sides' register tables (the
    * [[hllMergedDistinct]] merge identity), so NOTHING beyond the two
    * m-register tables ever moves. Complements [[cmsJoinSizeEstimate]]:
    * CMS predicts the join's OUTPUT size (multiplicity-weighted), this
    * predicts how many distinct keys actually match — together they
    * distinguish "few hot keys amplify" from "broad genuine overlap"
    * before a cluster commits to the join. The sketch is deterministic
    * (md5-derived), so the estimate is engine-replayable; inclusion-
    * exclusion can yield a small negative when the two sides are nearly
    * disjoint (errors don't cancel), clamped at 0 like any real
    * pre-flight would.
    *
    * One row: (exact_overlap, est_left, est_right, est_union,
    * est_overlap). Drop the exact column at scale — it is the gate's
    * truth check, computed from the two per-key distinct sets without
    * materializing the join. */
  /** Estimator half of [[hllKeyOverlap]] — the three sketch estimates and
    * the clamped inclusion-exclusion overlap, NO exact computation. What a
    * real pre-flight runs ([[joinPreflightCard]]); the public gate wraps
    * it with the exact truth column. */
  private[operators] def hllKeyOverlapEstimateOnly(
      left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String,
      m: Int = 256): DataFrame = {
    require(m >= 16 && (m & (m - 1)) == 0, s"m must be a power of two >= 16, got $m")
    val regBits = hllRegBits(m)
    val maxRho = hllMaxRho(m)
    val scaleC = hllScaleC(m)
    def regs(df: DataFrame, keyCol: String): DataFrame = {
      val h = conv(substring(md5(col(keyCol).cast("string")), 1, 15), 16, 10)
        .cast("long")
      df.filter(col(keyCol).isNotNull).select(h.as("h"))
        .select(col("h").bitwiseAND(lit((m - 1).toLong)).as("reg"),
          shiftright(col("h"), regBits).as("rest"))
        .select(col("reg"), when(col("rest") === 0, lit(maxRho))
          .otherwise(lit(maxRho) - length(bin(col("rest")))).as("rho"))
        .groupBy("reg").agg(max(col("rho")).as("rho"))
    }
    def estimate(regTable: DataFrame, name: String): DataFrame =
      regTable.agg(
          count(lit(1)).as("np"),
          sum(call_function("shiftleft", lit(1L),
            lit(maxRho) - col("rho"))).as("scaled"))
        .select((col("scaled") + (lit(m.toLong) - col("np")) *
            call_function("shiftleft", lit(1L), lit(maxRho))).cast("double").as("total"),
          col("np"))
        .select(when(lit(scaleC) / col("total") <= lit(2.5 * m) &&
            lit(m.toLong) - col("np") > 0,
            lit(m.toDouble) * log(lit(m.toDouble) / (lit(m.toLong) - col("np"))))
          .otherwise(lit(scaleC) / col("total")).as(name))
    val la = regs(left, leftKey).localCheckpoint()   // each <= m rows
    val rb = regs(right, rightKey).localCheckpoint()
    val union = la.withColumnRenamed("rho", "ra")
      .join(rb.withColumnRenamed("rho", "rb"), Seq("reg"), "full_outer")
      .select(col("reg"),
        greatest(coalesce(col("ra"), lit(0)), coalesce(col("rb"), lit(0))).as("rho"))
      .filter(col("rho") > 0) // a register absent on both sides stays absent
    estimate(la, "ea")
      .crossJoin(estimate(rb, "eb"))
      .crossJoin(estimate(union, "eu"))
      .select(round(col("ea"), 2).as("est_left"),
        round(col("eb"), 2).as("est_right"),
        round(col("eu"), 2).as("est_union"),
        round(greatest(col("ea") + col("eb") - col("eu"), lit(0.0)), 2)
          .as("est_overlap"))
  }

  def hllKeyOverlap(left: DataFrame, leftKey: String,
                    right: DataFrame, rightKey: String,
                    m: Int = 256): DataFrame = {
    val est = hllKeyOverlapEstimateOnly(left, leftKey, right, rightKey, m)
    val exact = left.filter(col(leftKey).isNotNull)
      .select(col(leftKey).cast("string").as("k")).distinct()
      .join(right.filter(col(rightKey).isNotNull)
        .select(col(rightKey).cast("string").as("k")).distinct(), Seq("k"), "left_semi")
      .agg(count(lit(1)).cast("long").as("exact_overlap"))
    exact.crossJoin(est)
      .select(col("exact_overlap"), col("est_left"), col("est_right"),
        col("est_union"), col("est_overlap"))
  }

  /** Corpus-wide top-`topK` word n-grams by occurrence count (the heavy-
    * hitter profile of a training corpus: boilerplate detection, template
    * mining, tokenizer-vocab sanity checks).
    *
    * Shape: one shuffled count per distinct gram (map-side partial), then the
    * global top-k rides the bounded [[graft.functions.TopKAgg]] — the final
    * single-reducer merge sees at most k rows per upstream partition instead
    * of sorting the full gram vocabulary. Ties break on the gram string so
    * the cut is deterministic. */
  def topNgrams(df: DataFrame, textCol: String, n: Int, topK: Int): DataFrame = {
    val spark = df.sparkSession
    graft.functions.TextHashFunctions.register(spark)
    graft.functions.TopKAgg.register(spark)
    val grams = df.select(explode(
      graft.functions.TextHashFunctions.shingles(col(textCol), n)).as("gram"))
    val counts = grams.groupBy("gram").agg(count(lit(1)).cast("long").as("n_occ"))
    counts
      .agg(graft.functions.TopKAgg.topK(
        struct(negate(col("n_occ")).as("negn"), col("gram").as("gram")), topK).as("arr"))
      .select(posexplode(col("arr")))
      .select(col("col.gram").as("gram"), negate(col("col.negn")).as("n_occ"),
        (col("pos") + 1).cast("long").as("rank"))
  }

  /** Heavy-hitter CHURN between two periods: top-`topK` n-grams per
    * period (count desc, gram asc — the [[topNgrams]] partial-top-k
    * path, never a vocabulary rank window) full-outer-joined on the
    * gram, with rank movement and entered/dropped/steady status — the
    * "what changed in the corpus this month" card that a single-period
    * top-k can't answer. One token scan (both periods' counts in one
    * aggregate), two bounded top-k folds, one ≤2·topK-row join. */
  def topKChurn(df: DataFrame, textCol: String, periodBCol: Column,
                n: Int, topK: Int): DataFrame = {
    val spark = df.sparkSession
    graft.functions.TextHashFunctions.register(spark)
    graft.functions.TopKAgg.register(spark)
    val counts = df.select(periodBCol.as("pb"), explode(
        graft.functions.TextHashFunctions.shingles(col(textCol), n))
        .as("gram"))
      .filter(col("pb").isNotNull)
      .groupBy(col("pb"), col("gram"))
      .agg(count(lit(1)).cast("long").as("n_occ"))
    val tops = counts.groupBy(col("pb"))
      .agg(graft.functions.TopKAgg.topK(
        struct(negate(col("n_occ")).as("negn"), col("gram").as("gram")),
        topK).as("arr"))
      .select(col("pb"), posexplode(col("arr")))
      .select(col("pb"), col("col.gram").as("gram"),
        negate(col("col.negn")).as("n_occ"),
        (col("pos") + 1).cast("long").as("rank"))
      .localCheckpoint(eager = false) // both sides of the churn join
    val a = tops.filter(!col("pb")).select(col("gram"),
      col("n_occ").as("n_a"), col("rank").as("rank_a"))
    val b = tops.filter(col("pb")).select(col("gram"),
      col("n_occ").as("n_b"), col("rank").as("rank_b"))
    a.join(b, Seq("gram"), "full_outer")
      .select(col("gram"), col("n_a"), col("rank_a"), col("n_b"),
        col("rank_b"),
        when(col("rank_a").isNull, "entered")
          .when(col("rank_b").isNull, "dropped")
          .otherwise("steady").as("status"),
        (coalesce(col("rank_a"), lit(0L)) -
          coalesce(col("rank_b"), lit(0L))).as("rank_move"))
  }

  /** Rolling `windowDays`-day distinct estimate via HLL REGISTER MERGE —
    * the scale path for "7-day active users": the exact rolling distinct
    * ([[graft.operators.EventOps.rollingActiveUsers]]) must carry every
    * (day, user) pair into each window, while this ships each day's
    * m-register sketch into its ≤ `windowDays` windows and max-merges —
    * per-window state is `m` registers regardless of cardinality, and the
    * daily sketch table (days × m rows) is reusable across window widths
    * without re-reading events.
    *
    * Same deterministic pipeline as [[hllDistinct]] (md5-60-bit hash,
    * scaled-integer harmonic sum), so the estimate replays externally.
    * Windows are reported for each day PRESENT in the data, covering
    * [day − windowDays + 1, day]; leading windows are naturally partial
    * (`n_days` says how many days contributed). The `exact_distinct`
    * column is the error-inspection diagnostic — drop it at scale, it is
    * exactly the shuffle this operator exists to avoid. */
  def hllRollingDistinct(df: DataFrame, tsCol: String, valueCol: String,
                         windowDays: Int = 7, m: Int = 256): DataFrame = {
    require(m >= 16 && (m & (m - 1)) == 0, s"m must be a power of two >= 16, got $m")
    require(windowDays >= 1, "windowDays >= 1")
    val regBits = hllRegBits(m)
    val maxRho = hllMaxRho(m)
    val scaleC = hllScaleC(m)
    val rows = df.filter(col(valueCol).isNotNull && col(tsCol).isNotNull)
      .select(to_date(col(tsCol)).as("day"), col(valueCol).as("v"))
    val h = conv(substring(md5(col("v").cast("string")), 1, 15), 16, 10).cast("long")
    val daily = rows.select(col("day"), h.as("h"))
      .withColumn("reg", col("h").bitwiseAND(lit((m - 1).toLong)))
      .withColumn("rest", shiftright(col("h"), regBits))
      .withColumn("rho", when(col("rest") === 0, lit(maxRho))
        .otherwise(lit(maxRho) - length(bin(col("rest")))))
      .groupBy(col("day"), col("reg")).agg(max(col("rho")).as("rho"))
      .localCheckpoint() // days x m rows; feeds the window ends AND the merge
    val wends = daily.select(col("day").as("wend")).distinct()
    val merged = daily
      .withColumn("wend", explode(sequence(col("day"),
        date_add(col("day"), windowDays - 1))))
      .join(wends, "wend") // only windows ending on an observed day
      .groupBy(col("wend"), col("reg")).agg(max(col("rho")).as("rho"))
    val est = merged.groupBy(col("wend")).agg(
        count(lit(1)).as("np"),
        sum(call_function("shiftleft", lit(1L),
          lit(maxRho) - col("rho"))).as("scaled"))
      .select(col("wend"), {
        val total = (col("scaled") + (lit(m.toLong) - col("np")) *
          call_function("shiftleft", lit(1L), lit(maxRho))).cast("double")
        val eRaw = lit(scaleC) / total
        val zeros = lit(m.toLong) - col("np")
        round(when(eRaw <= lit(2.5 * m) && zeros > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / zeros)).otherwise(eRaw), 2)
          .as("hll_distinct")
      })
    val exact = rows.distinct()
      .withColumn("wend", explode(sequence(col("day"),
        date_add(col("day"), windowDays - 1))))
      .join(wends, "wend")
      .groupBy(col("wend"))
      .agg(countDistinct(col("v")).cast("long").as("exact_distinct"),
        countDistinct(col("day")).cast("long").as("n_days"))
    exact.join(est, Seq("wend"), "left")
      .select(col("wend").as("window_end"), col("n_days"),
        col("exact_distinct"), coalesce(col("hll_distinct"), lit(0.0))
          .as("hll_distinct"))
  }

  /** K-minimum-values (bottom-k) distinct sketches per group, with pairwise
    * set-overlap estimates — the sketch family HLL cannot provide: an HLL
    * union is exact-by-merge but its INTERSECTION only comes from
    * inclusion–exclusion ([[hllKeyOverlap]]), whose error explodes when the
    * overlap is small relative to either set. A KMV sketch is the group's k
    * smallest distinct hash values; because the k-mins of A∪B are computable
    * from the two sketches alone, the fraction ρ of combined k-mins present
    * in BOTH sketches is an unbiased Jaccard estimator and
    * `|A∩B| ≈ ρ·|A∪B|` follows directly (Beyer et al., SIGMOD'07;
    * the same bottom-k construction as Broder's original MinHash resemblance
    * estimator).
    *
    * Estimates: a sketch holding fewer than k values IS its whole set
    * (exact); a saturated sketch estimates `(k−1)·2³²/h_k` with `h_k` the
    * kth-smallest 32-bit hash. Relative error ~ 1/√k (k=128 → ~9%).
    *
    * Scale shape: one distinct on (group, hash) — the same shuffle an exact
    * distinct-count pays — then the k-mins ride the bounded
    * [[graft.functions.TopKAgg]] (map-side partial, ≤ k values per partition
    * shuffled, never the value set); the pair stage is a self-join of the
    * |groups|-row sketch table, broadcast by construction. All arithmetic is
    * integer or single IEEE ops over the md5-derived portable hash, so an
    * external engine replays every estimate bit-for-bit.
    *
    * Output: one row per unordered group pair (g_a < g_b) with per-side,
    * union, and intersection estimates plus the Jaccard ρ. */
  def kmvOverlap(df: DataFrame, keyCol: String, groupCol: String,
                 k: Int = 128): DataFrame = {
    require(k >= 2, "k >= 2")
    graft.functions.TopKAgg.register(df.sparkSession)
    val hashes = df.filter(col(keyCol).isNotNull)
      .select(col(groupCol).cast("string").as("g"),
        graft.functions.Hashes.portableHash32(col(keyCol).cast("string")).as("h"))
      .distinct() // KMV sketches SETS: one vote per (group, hash)
    val sk = hashes.groupBy("g")
      .agg(graft.functions.TopKAgg.topK(col("h"), k).as("sk"))
    // (k-1)*2^32 is exact in a double for any sane k; same literal in the oracle
    def est(s: Column): Column =
      when(size(s) < k, size(s).cast("double"))
        .otherwise(lit((k - 1).toDouble * 4294967296.0) / element_at(s, -1))
    val a = sk.select(col("g").as("g_a"), col("sk").as("sk_a"))
    val b = sk.select(col("g").as("g_b"), col("sk").as("sk_b"))
    a.join(b, col("g_a") < col("g_b"))
      .withColumn("comb", slice(array_sort(array_union(col("sk_a"), col("sk_b"))), 1, k))
      .withColumn("m", size(col("comb")))
      .withColumn("union_est",
        when(col("m") < k, col("m").cast("double"))
          .otherwise(lit((k - 1).toDouble * 4294967296.0) /
            element_at(col("comb"), -1)))
      .withColumn("rho",
        size(array_intersect(array_intersect(col("comb"), col("sk_a")),
          col("sk_b"))).cast("double") / col("m"))
      .select(col("g_a"), col("g_b"),
        round(est(col("sk_a")), 2).as("n_a_est"),
        round(est(col("sk_b")), 2).as("n_b_est"),
        round(col("union_est"), 2).as("union_est"),
        round(col("rho"), 4).as("jaccard_est"),
        round(col("rho") * col("union_est"), 2).as("inter_est"))
  }
}
