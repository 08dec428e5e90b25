package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deterministic hash-based sampling and dataset splitting.
  *
  * At 100 TB a sample must be (a) reproducible across runs and engines
  * (no RNG state, no partition-order dependence), (b) stable under
  * repartitioning, and (c) pushable below wide operators. Keying on
  * `md5(key)`'s leading 32 bits gives all three: the predicate is a
  * pure per-row expression (pipelines into the scan), and the same
  * rows are selected by any engine that can compute md5 — which is
  * exactly how the DuckDB oracle mirrors it. This is the sampling
  * primitive behind k-means fitting, eval-split carving and
  * per-experiment subcorpora (reference samples ad hoc in pandas;
  * SURVEY §2.4 A-family).
  */
object Sampling {

  private val Space: Double = 4294967296.0 // 2^32

  /** Leading 32 md5 bits of the key as an unsigned long — uniform on
    * [0, 2^32), deterministic, engine-portable.
    */
  def hash32(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long")

  /** The exact threshold used for `fraction`: computed ONCE here (Java
    * double→long truncation) and inlined as a literal on both the
    * Spark and oracle side — two engines rounding `fraction * 2^32`
    * independently could disagree on the boundary hash.
    */
  def threshold(fraction: Double): Long = (fraction * Space).toLong

  /** Keep rows whose key hashes into the first `fraction` of the hash
    * space. Deterministic: same keys selected every run, on any
    * engine, under any partitioning. Null keys hash to null and are
    * never selected — consistent with `splitAssign`, which gives them
    * a null split label.
    */
  def hashSample(df: DataFrame, key: Column, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0,1]")
    df.filter(hash32(key) < lit(threshold(fraction)))
  }

  /** Assign each row a split label by cumulative hash-range buckets,
    * e.g. `Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)`. The last
    * split absorbs the remainder of the space, so weights that sum to
    * 1 partition it exactly; every non-null key lands in exactly one
    * split, stable across runs and engines. Null keys get a NULL split
    * label (not a silent fall-through into the last split, which would
    * skew its size and composition) — filter or impute them upstream.
    */
  def splitAssign(
      df: DataFrame,
      key: Column,
      splits: Seq[(String, Double)],
      splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "splits must be non-empty")
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _).tail.map(threshold)
    val h = hash32(key)
    val assigned = splits.init.zip(cum.init).foldRight(
      lit(splits.last._1): Column) { case (((name, _), hi), rest) =>
      when(h < lit(hi), lit(name)).otherwise(rest)
    }
    df.withColumn(
      splitCol,
      when(key.isNull, lit(null).cast("string")).otherwise(assigned))
  }

  /** Leakage-safe train/val/test split: near-dup CLUSTERS are the
    * split unit, not documents — two near-duplicate docs must never
    * land in different splits (a val doc whose near-dup sits in train
    * is leakage: the model has effectively seen the answer). Split
    * assignment hashes `coalesce(cluster_id, id)` — the cluster's
    * canonical id for paired docs, the doc's own id for singletons —
    * through the same deterministic [[splitAssign]] thresholds, so
    * every member of a cluster shares one hash and one split.
    *
    * `pairs` is any near-dup pair stream ((id_a, id_b) — Jaccard,
    * MinHash, SimHash, embedding); cluster resolution is
    * [[Dedup.clusterPairs]]' O(log n)-round delta iteration. Scale
    * shape: one left join of the corpus against the label table
    * (labels exist only for paired docs — broadcast-sized when dup
    * rates are production-normal) plus the per-row hash.
    */
  def leakageSafeSplit(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      splits: Seq[(String, Double)],
      splitCol: String = "split"): DataFrame =
    leakageSafeSplitLabeled(df, idCol, Dedup.clusterPairs(pairs), splits, splitCol)

  /** [[leakageSafeSplit]] off PRECOMPUTED cluster labels
    * ((id, cluster_id) — e.g. a loaded
    * [[graft.sources.Io.readDupGraphLabels]] artifact): the split is
    * a label join + per-row hash, with the expensive pair pipeline
    * and transitive closure amortized into the artifact build instead
    * of re-derived per split job. Labels may cover paired docs only;
    * unlabeled docs split on their own id (singleton rule).
    */
  def leakageSafeSplitLabeled(
      df: DataFrame,
      idCol: String,
      labels: DataFrame,
      splits: Seq[(String, Double)],
      splitCol: String = "split"): DataFrame = {
    val lab = labels
      .select(col("id").as(idCol), col("cluster_id").as("__cluster"))
    splitAssign(
      df.join(lab, Seq(idCol), "left"),
      coalesce(col("__cluster"), col(idCol)),
      splits,
      splitCol)
      .drop("__cluster")
  }

  /** Per-stratum deterministic cap: keep at most `cap` rows per
    * stratum (e.g. per domain/source), winners chosen by hash order —
    * the standard "no domain dominates the corpus" pretraining control,
    * reproducible across runs and engines like `hashSample`.
    *
    * Scale shape: one row_number window per stratum — strata are
    * numerous and individually modest (domains), so partitions stay
    * bounded. For a pathologically heavy stratum, pre-thin it with
    * `hashSample(cap / estimated_count)` before the exact window: the
    * hash ORDER is the same expression, so pre-thinning keeps exactly
    * the eventual winners' superset.
    */
  def stratifiedCap(df: DataFrame, stratum: Column, key: Column, cap: Int): DataFrame = {
    require(cap > 0, "cap must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum)
      .orderBy(hash32(key), key)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap)
      .drop("__rn")
  }

  /** Token-budget sampling: keep docs, in deterministic hash order,
    * while each group's running TOKEN total stays within `budget` —
    * the "take ~1B tokens per source" corpus-carving knob
    * (stratifiedCap counts documents; training budgets are tokens).
    * Composed as `runningCap` over the hashSample ordering, so the
    * kept set is reproducible on any engine/partitioning and nests
    * within any larger budget's kept set (prefix property of the
    * fixed hash order).
    *
    * Scale shape: one running-sum window per group, same posture as
    * `packBins` (groups are sources/domains — numerous, individually
    * bounded; no frame buffering). For a pathologically heavy group,
    * pre-thin with `hashSample(budget / estimated_tokens)` — the
    * shared hash order keeps a superset of the eventual winners.
    */
  def tokenBudget(
      df: DataFrame,
      group: Column,
      key: Column,
      tokenCount: Column,
      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    Relational.runningCap(df, Seq(group), Seq(hash32(key), key), tokenCount, budget)
  }

  /** Weighted sampling without replacement, k per group
    * (Efraimidis–Spirakis A-ES): each row draws u = (hash32(key)+1)/2^32
    * from ITS OWN hash — deterministic, engine-portable — and ranks by
    * the exponential key ln(u)/w; the k largest keys per group are the
    * weighted sample (a row with twice the weight is twice as likely
    * to make the cut, exactly). `tokenBudget` fills a budget in a
    * fixed order; this draws a SIZE-k sample with probability
    * proportional to weight — the "sample 10k docs, long docs
    * proportionally likelier" knob.
    *
    * The key is rounded at 9 decimals on both engines before ranking:
    * ln is correctly rounded to within 1 ulp but not identically
    * across libms, and an ulp straddling a rank boundary would flip
    * the selection — the same one-rounding-point rule as the micro-nat
    * LMs, applied at the comparison site. Zero/negative weights are
    * excluded (their draw probability is 0).
    *
    * Scale shape: one row_number window per group over per-row keys —
    * the stratifiedCap posture (numerous, individually bounded
    * groups); pre-thin a pathologically heavy group with `hashSample`
    * first if needed.
    */
  def weightedSample(
      df: DataFrame,
      group: Column,
      key: Column,
      weight: Column,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val u = (hash32(key) + lit(1L)).cast("double") / lit(Space)
    val esKey = round(log(u) / weight.cast("double"), 9)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(group)
      .orderBy(esKey.desc, key)
    df.filter(weight > 0)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Deterministic contrastive negative sampling: `k` pseudo-random
    * negatives per anchor, drawn from a hash-sampled candidate POOL —
    * the shape contrastive-training pipelines use (negatives come
    * from a sampled pool, not the full corpus). Negative j of anchor
    * a is pool[hash32(a ++ ":" ++ j) mod |pool|]: reproducible on any
    * engine/partitioning, uniform over the pool, and independent
    * across (anchor, j) slots. Self-pairs are dropped (a ~1/|pool|
    * slot loss, deterministic too).
    *
    * Scale shape: the pool is rank-indexed once (a bounded window —
    * `poolFraction` sizes it to stay broadcastable) and the
    * assignment is a map-side broadcast equi-join on the modular
    * rank; anchors never shuffle.
    */
  def hashNegatives(
      df: DataFrame,
      key: Column,
      k: Int,
      poolFraction: Double): DataFrame = {
    require(k > 0, "k must be positive")
    val pool = hashSample(df.select(key.as("__nid")), col("__nid"), poolFraction)
      .withColumn(
        "__rk",
        row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(hash32(col("__nid")), col("__nid"))).cast("long") - 1L)
    // counted eagerly (the pool is broadcast-small by design — the
    // constant-bootstrap licence): an empty pool would otherwise make
    // pmod(h, 0) NULL and silently return ZERO negatives for the
    // whole corpus; the count also rides as a literal, so no 1-row
    // crossJoin reaches the plan
    val poolSize = pool.count()
    require(
      poolSize > 0,
      s"hashNegatives: empty candidate pool (poolFraction=$poolFraction) — raise the fraction")
    df.select(key.as("anchor"))
      .select(col("anchor"), explode(sequence(lit(1), lit(k))).as("j"))
      .withColumn(
        "__rk",
        pmod(
          hash32(concat(col("anchor").cast("string"), lit(":"), col("j").cast("string"))),
          lit(poolSize)))
      .join(broadcast(pool), Seq("__rk"))
      .filter(col("__nid") =!= col("anchor"))
      .select(col("anchor"), col("j").cast("long").as("j"), col("__nid").as("neg_id"))
  }

  /** Mixture (curriculum) sampling: carve the LARGEST corpus whose
    * group composition matches `targets` exactly in expectation —
    * the "30% web, 50% code, 20% academic" pretraining mixture knob.
    *
    * Water-filling: the feasible total is `T = min over g of
    * n_g / w_g` (the scarcest group binds), each group keeps the
    * deterministic hash-fraction `f_g = w_g * T / n_g` of its rows
    * (the binding group keeps all of them, f = 1). Groups not named
    * in `targets` are dropped. Same reproducibility contract as
    * `hashSample`: pure per-row hash predicate, identical rows on any
    * engine/partitioning; the per-group fractions derive from exact
    * counts via IEEE double division, so an oracle recomputes them
    * bit-identically.
    *
    * Scale shape: one tiny count agg (|groups| rows) broadcast back —
    * the corpus side is a single map-side filter, no shuffle of data
    * rows.
    */
  /** Sequence packing (concat-and-chunk): assign each doc to a fixed
    * token-budget bin within its group — the "pack short documents
    * into 4k-token training sequences" step. Docs are ordered by the
    * deterministic hash (same shuffle-free reproducibility contract as
    * `hashSample`), the running token total BEFORE each doc is divided
    * by the budget, and the quotient is the bin: greedy concat-then-
    * chunk, where an overflowing doc spills into the next bin exactly
    * like the flattened-stream chunker a trainer runs. Integer `div`
    * on longs, so the oracle's floor-division mirrors bit-for-bit.
    *
    * Scale shape: one window per group (groups are
    * sources/domains — numerous, individually bounded); the window
    * needs only a running sum, no frame buffering.
    */
  def packBins(
      df: DataFrame,
      group: Column,
      key: Column,
      tokenCount: Column,
      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(group)
      .orderBy(hash32(key), key)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.withColumn("__cum", sum(tokenCount).over(w) - tokenCount)
      .withColumn("pack_bin", expr(s"__cum div $budget"))
      .drop("__cum")
  }

  /** DSIR-style importance weighting (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): hash every token
    * into `buckets` feature buckets, fit target-vs-raw unigram bucket
    * distributions (add-one smoothed over the bucket count), and score
    * each doc by its summed per-token log importance ratio
    * ln(p_target/p_raw). Ranking a raw crawl by this score skews a
    * 100 TB corpus toward a target domain without a learned
    * classifier — the mixture-selection step the reference has no
    * analogue for (SURVEY §2.12 sampling family).
    *
    * Determinism: the per-bucket log ratio is rounded once to
    * micro-nats (BIGINT); doc accumulation is an exact integer sum
    * (same contract as TextAnalysis.perplexity), and `hash32`-bucketed
    * features make the whole score engine-portable. Scale shape: ONE
    * map-side-combined hash agg over the token stream computes raw and
    * target counts together (count + conditional count — no second
    * pass, no left join), and the scoring join broadcasts the ratio
    * table, bounded by `buckets` rows regardless of corpus size. Two
    * streaming passes, one unavoidable shuffle (the per-doc agg).
    * Returns (id, n_tokens, weight6, avg_loglik).
    */
  def dsirWeights(
      df: DataFrame,
      textCol: String,
      idCol: String,
      isTarget: Column,
      buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val toks = df
      .filter(length(trim(col(textCol))) > 0)
      .select(
        col(idCol).as("id"),
        isTarget.as("__tgt"),
        explode(graft.functions.TextFns.tokens(col(textCol))).as("term"))
      .select(col("id"), col("__tgt"), (hash32(col("term")) % buckets).as("f"))
    // The bucket-stats table is bounded by `buckets` rows at ANY corpus
    // size, so collecting it is a constant bootstrap (the same licence
    // as Similarity's centroid fit), not a data-scale action — and it
    // buys back a whole corpus pass: computing totals and ratios as
    // DataFrame aggs would re-scan the token stream to re-derive fc.
    // Rounding is BigDecimal HALF_UP to match Spark round()/DuckDB
    // round() half-away-from-zero on the negative ratios.
    val fc = toks.groupBy(col("f")).agg(
      count(lit(1)).as("cr"),
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("ct"))
      .collect()
    val tr = fc.map(_.getLong(1)).sum.toDouble
    val tt = fc.map(_.getLong(2)).sum.toDouble
    val b = buckets.toDouble
    val lrRows = fc.toSeq.map { r =>
      val cr = r.getLong(1)
      val ct = r.getLong(2)
      val ratio = math.log((ct + 1.0) / (tt + b)) - math.log((cr + 1.0) / (tr + b))
      val lr6 = BigDecimal(ratio * 1e6)
        .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toLong
      (r.getLong(0), lr6)
    }
    val spark = df.sparkSession
    import spark.implicits._
    val lr = broadcast(lrRows.toDF("f", "lr6"))
    toks.join(lr, Seq("f"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("lr6")).as("weight6"))
      .select(
        col("id"),
        col("n_tokens"),
        col("weight6"),
        round(
          col("weight6").cast("double") / (col("n_tokens").cast("double") * lit(1e6)),
          6).as("avg_loglik"))
  }

  /** Temperature-based source balancing (the T5/mT5 `n^alpha` rule):
    * group g is sampled with probability mass proportional to
    * `count(g)^alpha`, flattening a head-heavy domain distribution
    * toward uniform as alpha → 0 while alpha = 1 reproduces the raw
    * mix. `total` sets the target sample size; a group whose quota
    * exceeds its population is taken whole (fraction capped at 1, so
    * the realized total can undershoot — the honest behavior, not a
    * silent re-spread over other groups).
    *
    * Determinism: a float normalizer summed in Spark partition order
    * would make the per-row threshold run-dependent, so the per-group
    * exact counts are collected (bounded by the number of distinct
    * groups — the same boundedness the broadcast fraction table
    * already assumes) and the normalizer is a SEQUENTIAL fold in group
    * order, reproducible on any engine that folds in the same order
    * (the oracle mirrors it with an ORDER BY list_reduce). Each
    * group's keep-threshold is truncated ONCE to an integer hash
    * cutoff, so the per-row predicate `hash32(key) < t` compares
    * longs — no float at row scope. `pow` itself is the one op not
    * IEEE-correctly-rounded across libms; a last-ulp divergence moves
    * a group's cutoff only if f*2^32 sits within ~f*4e-7 of an
    * integer — the same residual class as the repo's micro-nat ln
    * rounding.
    *
    * Null-group contract (pinned, like the sibling samplers): rows
    * whose `group` is null are EXCLUDED from the sample — a null
    * group has no count row, takes no quota mass, and the inner join
    * on the threshold table drops its rows. Callers wanting nulls
    * sampled as a domain should `coalesce(group, lit("__null__"))`
    * upstream.
    */
  def temperatureSample(
      df: DataFrame,
      group: Column,
      key: Column,
      alpha: Double,
      total: Long): DataFrame = {
    require(alpha >= 0.0, "alpha must be non-negative")
    require(total > 0, "total must be positive")
    val counts = df.groupBy(group.cast("string").as("__g")).agg(count(lit(1)).as("__n"))
      .collect()
      .flatMap(r => Option(r.getString(0)).map(_ -> r.getLong(1)))
      .sortBy(_._1)
    val z = counts.foldLeft(0.0) { case (acc, (_, n)) => acc + math.pow(n.toDouble, alpha) }
    val thresholds = counts.toSeq.map { case (g, n) =>
      val f = math.min(1.0, math.pow(n.toDouble, alpha) / z * total.toDouble / n.toDouble)
      (g, (f * Space).toLong)
    }
    val spark = df.sparkSession
    import spark.implicits._
    df.join(broadcast(thresholds.toDF("__g", "__t")), group.cast("string") === col("__g"))
      .filter(hash32(key) < col("__t"))
      .drop("__g", "__t")
  }

  /** Epoch planning for data mixing: given per-group token counts, a
    * temperature-weighted target share (w_g ∝ n_g^alpha, the
    * temperatureSample law) of a total token `budget`, report how many
    * EPOCHS of each group the training run should take —
    * min(target_g / n_g, maxEpochs), the "repeat scarce sources up to
    * a cap" plan (data-constrained scaling, Muennighoff et al. 2023).
    * Returns (group, n_toks, w6, epochs6, epochs): weights and epochs
    * published as exact micro-unit BIGINTs (the entropy-family
    * discipline), epochs additionally as the derived double.
    *
    * Determinism: group counts collect to the driver (group-bounded
    * bootstrap, the temperatureSample contract) and the normalizer
    * folds in SORTED group order — the same left-to-right IEEE chain
    * the oracle's ordered list_reduce replays.
    *
    * Null contract: rows with a null `group` are EXCLUDED from the
    * plan (same rule as temperatureSample/hashSample — null is not a
    * schedulable source); callers wanting them planned should
    * `coalesce(group, lit("__null__"))` first. Zero-token groups are
    * excluded too: a source with nothing to sample is not
    * schedulable, and keeping it would put a 0/0 (NaN) in the epochs
    * column — which Spark's min and SQL least() order DIFFERENTLY,
    * the exact cross-engine divergence this module bans.
    */
  def epochPlan(
      df: DataFrame,
      group: Column,
      tokenCount: Column,
      alpha: Double,
      budget: Double,
      maxEpochs: Double): DataFrame = {
    require(alpha >= 0.0, "alpha must be non-negative")
    require(budget > 0.0 && maxEpochs > 0.0, "budget and maxEpochs must be positive")
    // the sum casts to long BEFORE the driver unbox (a double-typed
    // tokenCount column would otherwise ClassCastException), and a
    // group whose tokenCounts are all NULL sums to NULL — excluded
    // like a zero-token group (isNullAt guard, not a getLong unbox
    // that would NPE), per the null contract above
    val counts = df
      .groupBy(group.cast("string").as("__g"))
      .agg(sum(tokenCount).cast("long").as("__n"))
      .collect()
      .flatMap { r =>
        if (r.isNullAt(0) || r.isNullAt(1)) None
        else Some(r.getString(0) -> r.getLong(1))
      }
      .filter(_._2 > 0L)
      .sortBy(_._1)
    val z = counts.foldLeft(0.0) { case (acc, (_, n)) =>
      acc + math.pow(n.toDouble, alpha)
    }
    val rows = counts.toSeq.map { case (g, n) =>
      val w = math.pow(n.toDouble, alpha) / z
      val epochs = math.min(w * budget / n.toDouble, maxEpochs)
      (g, n, math.round(w * 1e6), math.round(epochs * 1e6), math.round(epochs * 1e6) / 1e6)
    }
    val spark = df.sparkSession
    import spark.implicits._
    rows.toDF("group", "n_toks", "w6", "epochs6", "epochs")
  }

  def mixtureSample(
      df: DataFrame,
      group: Column,
      key: Column,
      targets: Seq[(String, Double)]): DataFrame = {
    require(targets.nonEmpty, "targets must be non-empty")
    require(targets.forall(_._2 > 0.0), "target weights must be positive")
    val wCol = targets.foldLeft(lit(null).cast("double")) {
      case (acc, (g, wt)) => when(group === g, lit(wt)).otherwise(acc)
    }
    val targeted = df
      .withColumn("__w", wCol)
      .filter(col("__w").isNotNull)
    // counts start from the TARGET list, not the data: a target group
    // with zero rows means the water level is T = 0 and the whole
    // sample is empty — the honest exact-composition answer, not a
    // silent re-normalization over whichever groups happen to exist
    val tgt = df.sparkSession.createDataFrame(targets).toDF("__g", "__gw")
    val counts = tgt.join(
      targeted.groupBy(group.as("__g")).agg(count(lit(1)).cast("double").as("__n")),
      Seq("__g"),
      "left")
      .na.fill(0.0, Seq("__n"))
    val feasible = counts
      .agg(min(col("__n") / col("__gw")).as("__t"))
    val fractions = broadcast(
      counts
        .crossJoin(broadcast(feasible))
        .select(
          col("__g"),
          // a zero-count group has no rows to keep anyway, but ANSI
          // mode would still throw on its w*T/0 — pin its f to 0
          when(col("__n") === 0.0, lit(0.0))
            .otherwise(col("__gw") * col("__t") / col("__n")).as("__f")))
    targeted
      .join(fractions, group === col("__g"))
      .filter(hash32(key).cast("double") < col("__f") * lit(Space))
      .drop("__w", "__g", "__f")
  }

  /** Largest-remainder (Hamilton) apportionment of an integer sample
    * budget `k` across strata — the exact-quota answer to "give me
    * 100k docs that preserve the language mixture": proportional
    * float quotas drift (rounding them can over- or under-shoot k by
    * the stratum count), this never does. base_i = k·n_i div N, and
    * the k − Σbase leftover seats go to the largest remainders
    * k·n_i mod N (ties broken by stratum value ascending — total
    * order, both engines agree). Σ quota == k EXACTLY by
    * construction. All integer: counts, one truncating division and
    * one mod per stratum, a rank over the STRATA table (bounded —
    * never the corpus). k may exceed N (quotas then exceed counts —
    * the caller's with-replacement decision, documented not policed).
    * Returns (stratum, n, quota) for every non-null stratum.
    */
  /** Neyman optimal allocation (Neyman 1934) — the variance-aware
    * upgrade of [[quotaLargestRemainder]]: allocate an integer sample
    * budget k across strata proportionally to N_h·σ_h instead of
    * N_h, so high-variance strata (where each extra sample buys the
    * most estimator precision) get more of the budget. The stratified
    * -sampling planner for audit/eval draws over heterogeneous
    * sources.
    *
    * Determinism: the per-stratum weight is
    *   w6_h = round(1e6 · sqrt((Q_h · n_h) / (n_h − 1))),
    *   Q_h = n_h·SS_h − S_h²   (≥ 0 by Cauchy–Schwarz)
    * — exact integer moment sums into ONE double division and one
    * correctly-rounded IEEE sqrt (the a_gini/chi² float class),
    * rounded ONCE to a micro BIGINT; the apportionment over w6 is
    * then the exact largest-remainder arithmetic of
    * [[quotaLargestRemainder]] (base = k·w6 div W in DECIMAL, ties
    * by (remainder desc, stratum)). N_h·σ_h = sqrt(n·Q/(n−1))
    * because σ_h = sqrt(Q/(n(n−1))). Valid range: Q·n must stay
    * exact in a double (≲ 2^53) — cent-scale metrics to ~1e6 rows ×
    * 1e4-cent spread; quantize coarser above that.
    *
    * Conventions: strata with n < 2 are EXCLUDED (no variance
    * evidence — Neyman is undefined; pre-assign them separately);
    * a constant stratum (Q = 0) gets weight 0 and thus allocation 0
    * (zero variance needs zero samples under the optimality
    * criterion — pad with a minimum if policy requires eyes-on);
    * ALL strata constant fails fast in-plan (no variance signal
    * anywhere — use quotaLargestRemainder).
    *
    * Scale shape: one hash aggregate to stratum moments, a broadcast
    * 1-row total, one stratum-bounded window. Returns (stratum, n,
    * w6, alloc) with Σ alloc == k exactly.
    */
  def neymanAllocation(
      df: DataFrame,
      stratumCol: Column,
      valueCol: Column,
      k: Long): DataFrame = {
    require(k >= 0L, "k must be >= 0")
    import org.apache.spark.sql.expressions.Window
    val strata = df
      .filter(stratumCol.isNotNull && valueCol.isNotNull)
      .groupBy(stratumCol.as("stratum"))
      .agg(
        count(lit(1)).as("n"),
        sum(valueCol.cast("long")).as("__s"),
        sum(
          valueCol.cast("long").cast("decimal(38,0)")
            * valueCol.cast("long").cast("decimal(38,0)")).as("__ss"))
      .filter(col("n") >= 2L)
      .withColumn(
        "__q",
        expr(
          """CAST(n AS DECIMAL(38,0)) * __ss
            |- CAST(__s AS DECIMAL(38,0)) * CAST(__s AS DECIMAL(38,0))""".stripMargin))
      .withColumn(
        "w6",
        round(
          sqrt(
            (col("__q").cast("double") * col("n").cast("double")) /
              (col("n") - 1L).cast("double")) * lit(1e6),
          0).cast("long"))
      // stratum-bounded, persisted: the weight total and the
      // apportionment read one corpus scan
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = broadcast(strata.agg(sum(col("w6")).as("__w")))
    val based = strata
      .crossJoin(tot)
      .filter(
        assert_true(
          col("__w") > 0L,
          lit("neymanAllocation: every stratum is constant (zero variance " +
            "everywhere) — no Neyman signal; use quotaLargestRemainder")).isNull)
      .withColumn(
        "__base",
        expr(s"CAST((CAST($k AS DECIMAL(38,0)) * w6) div __w AS BIGINT)"))
      .withColumn(
        "__rem",
        expr(s"CAST((CAST($k AS DECIMAL(38,0)) * w6) % __w AS BIGINT)"))
    val leftover = broadcast(
      based.agg((lit(k) - sum(col("__base"))).as("__left")))
    based
      .withColumn(
        "__rk",
        row_number().over(Window.orderBy(col("__rem").desc, col("stratum"))))
      .crossJoin(leftover)
      .select(
        col("stratum"),
        col("n"),
        col("w6"),
        (col("__base") + when(col("__rk") <= col("__left"), 1L).otherwise(0L))
          .as("alloc"))
  }

  /** Exact-size stratified draw — [[quotaLargestRemainder]] quotas
    * FILLED deterministically: within each stratum, rows rank by
    * (md5-hash32(key), key) — the [[hashSample]] portability
    * discipline plus a key tie-break for a total order — and the
    * quota smallest ranks are selected. Σ selected == k EXACTLY for
    * k ≤ N (largest-remainder guarantees the quota sum; every
    * stratum's quota ≤ its row count because quotas are proportional
    * with floor+remainder ≤ n); k > N fails fast in-plan (a quota
    * exceeding its stratum's row count is exactly that signal) rather
    * than silently under-filling. Stable across runs, engines and
    * partitionings; adding rows to one stratum re-draws ONLY that
    * stratum's marginal members (hash ranks of old rows don't move).
    * Duplicate keys within a stratum are legal (ties broken by the
    * hash then the key — equal keys tie fully and the window picks
    * both or neither deterministically by rank position). Returns
    * the selected rows: (stratum, key, draw_rank).
    *
    * Scale shape: one quota pass (stratum-bounded) + one per-stratum
    * rank window over the candidate rows, broadcast quota join.
    */
  def stratifiedDraw(
      df: DataFrame,
      stratumCol: Column,
      keyCol: Column,
      k: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df
      .filter(stratumCol.isNotNull && keyCol.isNotNull)
      .select(stratumCol.as("stratum"), keyCol.as("key"))
    // fail fast on k > N: quotas would then exceed stratum row counts
    // and the draw would silently return fewer than k rows, breaking
    // the "Σ selected == k EXACTLY" contract. quota ≤ n per stratum
    // holds iff k ≤ N (proportional floor+remainder), so the in-plan
    // per-stratum assert IS the population guard — no eager count.
    val quotas = quotaLargestRemainder(base, col("stratum"), k)
      .filter(
        assert_true(
          col("quota") <= col("n"),
          concat(
            lit(s"stratifiedDraw: k = $k exceeds the population (stratum "),
            col("stratum").cast("string"), lit(" has "),
            col("n").cast("string"), lit(" rows, quota "),
            col("quota").cast("string"), lit(")"))).isNull)
      .select(col("stratum"), col("quota"))
    base
      .withColumn(
        "draw_rank",
        row_number().over(
          Window.partitionBy(col("stratum"))
            .orderBy(hash32(col("key")), col("key"))))
      .join(broadcast(quotas), Seq("stratum"))
      .filter(col("draw_rank") <= col("quota"))
      .select(col("stratum"), col("key"), col("draw_rank"))
  }

  def quotaLargestRemainder(df: DataFrame, stratumCol: Column, k: Long): DataFrame = {
    require(k >= 0L, "k must be >= 0")
    import org.apache.spark.sql.expressions.Window
    val strata = df
      .filter(stratumCol.isNotNull)
      .groupBy(stratumCol.as("stratum"))
      .agg(count(lit(1)).as("n"))
    val tot = broadcast(strata.agg(sum(col("n")).as("__N")))
    val based = strata
      .crossJoin(tot)
      .withColumn("__base", expr(s"CAST(CAST($k AS DECIMAL(38,0)) * n div __N AS BIGINT)"))
      .withColumn("__rem", expr(s"CAST(CAST($k AS DECIMAL(38,0)) * n % __N AS BIGINT)"))
    val leftover = broadcast(
      based.agg((lit(k) - sum(col("__base"))).as("__left")))
    based
      .withColumn(
        "__rk",
        row_number().over(Window.orderBy(col("__rem").desc, col("stratum"))))
      .crossJoin(leftover)
      .select(
        col("stratum"),
        col("n"),
        (col("__base") + when(col("__rk") <= col("__left"), 1L).otherwise(0L))
          .as("quota"))
  }
}
