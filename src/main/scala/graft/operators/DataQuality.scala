package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality auditing — the ingestion-side contract checks
  * a metadata pipeline runs before promoting a load (rule pass rates,
  * orphaned foreign keys, per-partition freshness). Shapes mirror the
  * reference's control-table philosophy (`M/utils/` config-driven
  * validation hooks) re-expressed as single-pass Spark aggregations.
  *
  * Scale contracts: [[ruleReport]] evaluates EVERY rule in one scan (one
  * conditional sum per rule inside a single aggregate — adding a rule
  * never adds a pass); [[referentialIntegrity]] is one left-anti count per
  * relationship (broadcast when the parent's key set fits, shuffle
  * otherwise — Catalyst's call); [[freshnessReport]] is one grouped
  * max/count plus a 1-row global frame. */
object DataQuality {

  /** Evaluate named row-level predicates in ONE pass: each rule reports
    * rows checked, failures, and the failure rate (6dp, exact integer
    * division). Null predicate results count as FAILURES (a rule that
    * cannot evaluate did not pass — the conservative audit stance). */
  def ruleReport(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    require(rules.map(_._1).distinct.size == rules.size,
      "duplicate rule names (duplicate aggregate aliases)")
    val aggs = count(lit(1)).as("__n") +: rules.map { case (name, pred) =>
      sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)).as(s"__f_$name")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot to one row per rule; rule order = declaration order
    val rows = rules.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(i).as("ord"), lit(name).as("rule"),
        col("__n").as("n_rows"), col(s"__f_$name").as("n_fail"))
    }
    one.select(explode(array(rows: _*)).as("r"))
      .select(col("r.rule").as("rule"), col("r.n_rows").as("n_rows"),
        col("r.n_fail").as("n_fail"),
        round(col("r.n_fail").cast("double") / col("r.n_rows"), 6)
          .as("fail_rate"))
  }

  /** Orphaned-foreign-key count for one child→parent relationship: rows
    * of `child` whose `childKey` has no match in `parent.parentKey`
    * (NULL child keys are orphans — they reference nothing). Returns one
    * row (relationship, n_child, n_orphans, orphan_rate). */
  def referentialIntegrity(child: DataFrame, childKey: String,
                           parent: DataFrame, parentKey: String,
                           relationship: String): DataFrame = {
    val parentKeys = parent.select(col(parentKey).as("__pk")).distinct()
    val orphans = child.select(col(childKey).as("__ck"))
      .join(parentKeys, col("__ck") === col("__pk"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
    val total = child.agg(count(lit(1)).as("n_child"))
    total.crossJoin(broadcast(orphans))
      .select(lit(relationship).as("relationship"), col("n_child"),
        col("n_orphans"),
        round(col("n_orphans").cast("double") / col("n_child"), 6)
          .as("orphan_rate"))
  }

  /** Per-group freshness: latest timestamp, row count, and how far the
    * group trails the table's newest row (whole seconds — exact integer
    * arithmetic on epoch micros). The staleness triage before blaming a
    * source feed. Groups whose timestamps are ALL null — a dead feed,
    * precisely what this report exists to surface — still appear, with
    * null `last_ts`/`lag_seconds` (max ignores nulls; no pre-filter that
    * would silently drop them) and `n_rows` counting every row. */
  def freshnessReport(df: DataFrame, groupCol: String, tsCol: String): DataFrame = {
    val grouped = df
      .groupBy(col(groupCol))
      .agg(max(unix_micros(col(tsCol))).as("last_us"),
        count(lit(1)).as("n_rows"))
    val global = grouped.agg(max(col("last_us")).as("global_us"))
    grouped.crossJoin(broadcast(global))
      .select(col(groupCol), timestamp_micros(col("last_us")).as("last_ts"),
        col("n_rows"),
        // INTEGER div — a double quotient could round across a whole
        // second near representation boundaries
        expr("(global_us - last_us) div 1000000").as("lag_seconds"))
  }

  /** k-anonymity / l-diversity audit — the re-identification-risk pre-flight
    * a dataset gets before leaving its trust boundary (the release-side
    * complement of [[graft.functions.Pii]]'s column hashing: hashing direct
    * identifiers does nothing about a (nation, segment) combination only one
    * person has). Rows are grouped into equivalence classes over the
    * quasi-identifier columns; a class smaller than `k` re-identifies its
    * members by linkage, and a class whose members all share one sensitive
    * value leaks it even at size ≥ k (hence l-diversity).
    *
    * Output is the class-SIZE profile, one row per observed class size:
    * how many classes, how many rows, the worst (minimum) sensitive-value
    * diversity at that size, and whether the size is below `k` — the
    * at-risk rows are `sum(n_rows where at_risk)`. Reporting by size keeps
    * the output bounded by |distinct sizes| (≤ √(2·rows) — sizes sum to the
    * row count) and PUBLISHABLE: it never echoes the quasi-identifier
    * values it warns about. Two aggregations, rows → classes → sizes, both
    * map-side-combinable; no windows. NULL sensitive values count toward
    * class size but not diversity (an unknown value diversifies nothing —
    * the conservative stance, same as [[ruleReport]]'s null-fails rule). */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String],
                      sensitiveCol: String, k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "at least one quasi-identifier column")
    require(k >= 2, "k >= 2")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("ldiv"))
      .groupBy(col("class_size"))
      .agg(count(lit(1)).cast("long").as("n_classes"),
        sum(col("class_size")).cast("long").as("n_rows"),
        min(col("ldiv")).cast("long").as("min_l_diversity"))
      .withColumn("at_risk", col("class_size") < k)
  }

  /** Order-independent per-group dataset fingerprint: row count plus the
    * SUM and XOR of a portable per-row hash — the cheap "is this replica
    * byte-identical?" check for datasets too big to sort and diff. Both
    * combiners are commutative, so the fingerprint is invariant to
    * partitioning, task order, and row order: two engines (or two sides of
    * a migration) agree iff they hold the same multiset of rows, with no
    * global sort and no row shipped anywhere — the aggregation state is
    * three numbers per group. Sum and xor together resist the single-bit
    * cancellations either alone would miss (xor misses duplicated rows,
    * sum misses balanced swaps).
    *
    * `cols` must be cast-stable columns (string / integer / boolean /
    * date): the row preimage is their string forms joined with `\u0001`,
    * nulls encoded as `\u0000` so (null, "") and ("", null) differ —
    * floating-point columns are excluded by contract since engines differ
    * in shortest-repr formatting. The hash is
    * [[graft.functions.Hashes.portableHash32]], so any md5-capable engine
    * reproduces the fingerprint bit-for-bit. */
  def datasetFingerprint(df: DataFrame, groupCol: String,
                         cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "at least one fingerprint column")
    val preimage = concat_ws("\u0001",
      cols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*)
    val rowHash = graft.functions.Hashes.portableHash32(preimage)
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("n_rows"),
        sum(rowHash).as("sum_hash"),
        call_function("bit_xor", rowHash).as("xor_hash"))
  }

  /** Benford first-digit audit of a positive numeric column: observed vs
    * expected `log₁₀(1+1/d)` share per leading digit — the classic
    * fabricated-or-truncated-data tripwire for organically-grown
    * magnitudes (amounts, populations, file sizes). A feed that suddenly
    * fails Benford usually switched to synthetic, defaulted, or clipped
    * values upstream; a column that never obeyed it (uniform ids,
    * bounded scores) shouldn't be audited this way — the operator reports
    * deviations, the reader supplies the applicability judgment.
    *
    * The leading digit comes from the INTEGER part (`floor → long →
    * string`), engine-portable where raw double formatting is not; rows
    * with value < 1 are excluded (no stable first digit across
    * magnitude-shifting representations). Shares are exact integer
    * divisions; expectation is one `log10` per digit.
    *
    * Scale: one conditional-count aggregate pass (9 sums, one scan — the
    * [[ruleReport]] shape), then arithmetic on a 9-row literal spine.
    * Output: one row per digit 1–9 (n, share, expected, abs_dev 6dp). */
  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    val digit = substring(floor(col(valueCol)).cast("long").cast("string"),
      1, 1).cast("int")
    val eligible = df.filter(col(valueCol).isNotNull && col(valueCol) >= 1)
      .select(digit.as("d"))
    val aggs = count(lit(1)).as("__n") +:
      (1 to 9).map(d => sum(when(col("d") === d, 1L).otherwise(0L))
        .as(s"__c_$d"))
    val one = eligible.agg(aggs.head, aggs.tail: _*)
    val rows = (1 to 9).map(d =>
      struct(lit(d.toLong).as("digit"), col(s"__c_$d").as("n"),
        col("__n").as("t")))
    val share = col("r.n").cast("double") / col("r.t")
    val expected = log10(lit(1.0) + lit(1.0) / col("r.digit"))
    one.select(explode(array(rows: _*)).as("r"))
      .select(col("r.digit").as("digit"), col("r.n").as("n"),
        round(share, 6).as("share"), round(expected, 6).as("expected"),
        round(abs(share - expected), 6).as("abs_dev"))
  }

  /** Disparate-impact (four-fifths rule) audit: per-group selection rates
    * and each group's ratio against the HIGHEST-rate group — the fairness
    * screen regulators actually apply (a ratio below 0.8 is presumptive
    * adverse impact), run on any selection-shaped decision: loan approval,
    * training-data keep/drop, moderation, sampling. Plugs the same hole
    * for DECISIONS that [[kAnonymityAudit]] plugs for releases.
    *
    * Null selection outcomes count as NOT selected ([[ruleReport]]'s
    * conservative stance). The reference group is the max-rate group with
    * ties broken by group name, so the report is deterministic; rates use
    * exact integer counts — the ratio division is the only float op.
    * One grouped aggregation + a 1-row broadcast reference frame. */
  def disparateImpact(df: DataFrame, groupCol: String,
                      selected: Column): DataFrame = {
    val rates = df.groupBy(col(groupCol).cast("string").as("grp"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(when(coalesce(selected, lit(false)), 1L).otherwise(0L))
          .as("n_sel"))
    val ref = rates.agg(max(struct(
        (col("n_sel").cast("double") / col("n")).as("rate"),
        col("grp").as("g"))).as("m"))
      .select(col("m.rate").as("ref_rate"), col("m.g").as("ref_group"))
    rates.crossJoin(broadcast(ref))
      .select(col("grp").as(groupCol), col("n"), col("n_sel"),
        round(col("n_sel").cast("double") / col("n"), 6).as("rate"),
        col("ref_group"),
        round((col("n_sel").cast("double") / col("n")) / col("ref_rate"), 4)
          .as("impact_ratio"),
        ((col("n_sel").cast("double") / col("n")) / col("ref_rate") >= 0.8)
          .as("passes_80pct"))
  }

  /** ε-DP count release via the DISCRETE Laplace (two-sided geometric)
    * mechanism: integer noise drawn by inverse-CDF lookup against
    * cumulative literals computed once from ε — so the hot path is a
    * hash + a CASE ladder, NO transcendental per row, and the release is
    * bit-reproducible in any engine that shares the hash (the q246
    * Poisson-weight pattern applied to privacy). Noise support is
    * truncated where the two-sided tail mass drops below 1e-9 —
    * negligible against the mechanism's own ε-budget accounting, and
    * stated here rather than hidden. Released counts clamp at 0
    * (post-processing preserves DP).
    *
    * THE GUARANTEE IS CONDITIONAL ON THE SEED: noise is a deterministic
    * hash of (seed, group), so anyone who knows the seed can recompute
    * and subtract it exactly — ε-DP holds ONLY if the seed is a secret,
    * single-use value drawn fresh per release (and repeated releases
    * under different seeds still compose their ε). That is why `seed`
    * has NO default and must be supplied by the caller: a shared or
    * hard-coded seed turns the release into the true counts. Determinism
    * given the seed is the unit-test/backfill harness contract, not a
    * privacy feature.
    *
    * Completes the privacy family: [[kAnonymityAudit]] says what is safe
    * to group, the COW DELETE (q262) erases, this RELEASES aggregates.
    * One aggregation; the CASE ladder is |support| branches (~43 at ε=1),
    * codegen-friendly. */
  /** Long-tail category collapse — the encoding step before one-hot or
    * target encoding: categories with support < `minSupport` fold into a
    * single OTHER row, and the report shows exactly what the model will
    * see (kept categories with shares, plus OTHER's aggregate mass and
    * how many raw categories it swallowed). Keeping the tail as explicit
    * rows is what makes the decision AUDITABLE: coverage = 1 − OTHER
    * share tells you if the threshold is eating signal. One aggregation
    * to the category frame; NULL categories fold into OTHER too (an
    * unknown category diversifies nothing — the q219 stance). */
  def rareCategoryCollapse(df: DataFrame, catCol: String,
                           minSupport: Long): DataFrame = {
    require(minSupport >= 1, "minSupport >= 1")
    val counts = df
      .groupBy(col(catCol).cast("string").as("cat"))
      .agg(count(lit(1)).cast("long").as("n"))
    val tot = counts.agg(sum(col("n")).cast("long").as("nt"))
    val tagged = counts.select(
      when(col("cat").isNull || col("n") < minSupport, lit("__OTHER__"))
        .otherwise(col("cat")).as("category"),
      col("n"),
      when(col("cat").isNull || col("n") < minSupport, 1L).otherwise(0L)
        .as("folded"))
    tagged.groupBy(col("category"))
      .agg(sum(col("n")).cast("long").as("n_rows"),
        sum(col("folded")).cast("long").as("n_source_categories"))
      .crossJoin(broadcast(tot))
      .select(col("category"),
        (col("category") === "__OTHER__").as("is_other"),
        col("n_rows"),
        when(col("category") === "__OTHER__",
          col("n_source_categories")).otherwise(1L)
          .as("n_source_categories"),
        round(col("n_rows").cast("double") / col("nt").cast("double"), 6)
          .as("share"))
  }

  /** Feature-hashing collision audit: hash the column's DISTINCT
    * categories into 2^`bits` buckets (portable md5, so the audit
    * replays anywhere the feature pipeline runs) and report how much
    * signal the hashing trick destroys — colliding buckets, categories
    * sharing a bucket, the max pile-up, and the birthday-bound
    * expectation E[collisions] = m − n·(1−(1−1/n)^m) to judge whether
    * the observed count is hash pathology or just math. The deploy gate
    * for choosing `bits` before training. Distinct-frame work only. */
  def featureHashAudit(df: DataFrame, catCol: String,
                       bits: Int): DataFrame = {
    require(bits >= 2 && bits <= 24, "bits in [2, 24]")
    val nBuckets = 1L << bits
    val buckets = df.filter(col(catCol).isNotNull)
      .select(col(catCol).cast("string").as("cat")).distinct()
      .select(pmod(graft.functions.Hashes.portableHash32(col("cat")),
        lit(nBuckets)).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).cast("long").as("load"))
    buckets.agg(
        sum(col("load")).cast("long").as("n_categories"),
        count(lit(1)).cast("long").as("n_buckets_used"),
        sum(when(col("load") >= 2, 1L).otherwise(0L)).cast("long")
          .as("n_colliding_buckets"),
        sum(when(col("load") >= 2, col("load")).otherwise(0L)).cast("long")
          .as("n_collided_categories"),
        max(col("load")).cast("long").as("max_bucket_load"))
      .select(col("n_categories"), lit(nBuckets).as("n_buckets"),
        col("n_buckets_used"), col("n_colliding_buckets"),
        col("n_collided_categories"), col("max_bucket_load"),
        round(col("n_categories").cast("double") -
          lit(nBuckets.toDouble) * (lit(1.0) -
            pow(lit(1.0) - lit(1.0 / nBuckets),
              col("n_categories").cast("double"))), 4)
          .as("expected_collided"))
  }

  /** Driver-side cumulative CDF of the truncated discrete Laplace —
    * shared with the oracle generator so BOTH engines embed the
    * bit-identical literals. */
  def discreteLaplaceCum(epsilon: Double): Seq[(Int, Double)] = {
    require(epsilon >= 0.05 && epsilon <= 10.0, "epsilon in [0.05, 10]")
    val p = math.exp(-epsilon)
    // smallest K with two-sided tail mass 2p^(K+1)/(1+p) < 1e-9
    val k = math.ceil(math.log(1e-9 * (1 + p) / 2) / math.log(p)).toInt
      .max(1)
    val w0 = (1 - p) / (1 + p)
    val weights = (-k to k).map(i => i -> w0 * math.pow(p, math.abs(i)))
    weights.scanLeft(0 -> 0.0) {
      case ((_, acc), (i, w)) => i -> (acc + w) }.tail
  }

  def dpNoisyCounts(df: DataFrame, groupCol: String, seed: String,
                    epsilon: Double = 1.0): DataFrame = {
    val cum = discreteLaplaceCum(epsilon)
    val k = cum.last._1
    val counts = df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol).as("g"))
      .agg(count(lit(1)).cast("long").as("n_true"))
    val u = graft.functions.Hashes.portableHash32(
      concat(lit(s"$seed:"), col("g").cast("string")))
      .cast("double") / lit(4294967296.0)
    val noise = cum.init.foldRight(lit(k.toLong): Column) {
      case ((i, c), rest) =>
        when(col("u") < lit(c), lit(i.toLong)).otherwise(rest)
    }
    counts.withColumn("u", u)
      .select(col("g").as(groupCol), col("n_true"),
        greatest(lit(0L), col("n_true") + noise.cast("long"))
          .as("released_count"),
        lit(epsilon).as("epsilon"))
  }
}
