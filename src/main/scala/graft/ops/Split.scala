package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import graft.functions.Hashing

import graft.engine.Caches.Registered

/** O1: shuffled train/test split (feature_extractor.py:128-172). The
  * reference shuffles indices and slices at `int(N * 0.8)` — an *exact-count*
  * split, not Bernoulli sampling.
  *
  * Two variants:
  *  - [[bernoulli]]: `randomSplit` — the scalable default (one pass, no
  *    global ordering). Use at 100 TB.
  *  - [[exact]]: deterministic exact-count split. The "shuffle" is a per-row
  *    LCG over a key column (reproducible across engines and partitionings,
  *    unlike `rand(seed)`), and the global row number is computed via
  *    range-partitioned sort + per-partition offsets — no single-partition
  *    window, so it scales (VERDICT r1 flagged the naive global `row_number`
  *    as a scale-killer).
  */
object Split {

  def bernoulli(df: DataFrame, trainFraction: Double, seed: Long): (DataFrame, DataFrame) = {
    val parts = df.randomSplit(Array(trainFraction, 1.0 - trainFraction), seed)
    (parts(0), parts(1))
  }

  /** Deterministic pseudo-shuffle key for `key` (must be integral + unique). */
  def shuffleKey(key: Column, seed: Long): Column =
    Hashing.lcg(key, seed, Hashing.LcgM)

  /** Global row number in (shufKey, key) order without a global window:
    * range-partition by the sort key, number within partitions, then add
    * per-partition offsets via a tiny broadcast join. Every stage is
    * parallel; the offsets aggregate is O(#partitions).
    */
  def globalRowNumber(df: DataFrame, shufKey: String, tieBreak: String,
                      numParts: Int = -1): DataFrame =
    globalRowNumber(df, Seq(col(shufKey), col(tieBreak)), numParts)

  /** Multi-column form of [[globalRowNumber]]: global row number in
    * ascending `sortCols` order (the last column should be a unique
    * tie-break so the order — and therefore the numbering — is total).
    */
  def globalRowNumber(df: DataFrame, sortCols: Seq[Column],
                      numParts: Int): DataFrame = {
    // Default the range-partition count to the session's shuffle
    // parallelism: a hardcoded constant caps the sort at N/const rows per
    // task no matter how big the cluster is. The numbering itself is
    // partitioning-independent (global sortCols order), so the
    // result is bit-identical at any count.
    val parts = if (numParts > 0) numParts
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // Persisted: the numbered frame feeds three consumers (the split
    // count, the per-partition offsets subquery, and the main path) —
    // without it the input chain and range shuffle run three times.
    val ranged = df.repartitionByRange(parts, sortCols: _*)
      .withColumn("_part", spark_partition_id())
      .persistTracked()
    val w = Window.partitionBy("_part").orderBy(sortCols: _*)
    val numbered = ranged.withColumn("_prn", row_number().over(w))
    val offsets = numbered.groupBy("_part").agg(count(lit(1)).as("_pcnt"))
      .withColumn("_offset",
        coalesce(sum(col("_pcnt")).over(
          Window.orderBy("_part").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("_part", "_offset")
    numbered.join(broadcast(offsets), "_part")
      .withColumn("rn", col("_offset") + col("_prn"))
      .drop("_part", "_prn", "_offset")
  }

  /** o14: LENGTH-BUCKETED BATCHING — group similar-length documents into
    * fixed-size batches so per-batch padding (every sequence padded to
    * the batch max) wastes as little compute as possible; random batching
    * pads most sequences to the corpus tail. Shape: the scalable
    * [[globalRowNumber]] in (length, tiebreak) order, then pure integer
    * arithmetic — bucket = (rn−1)·nb div N, batch = offset-from-bucket-
    * start div batchSize — so batch ids are bit-reproducible in any
    * engine and NO per-bucket window is needed (the one-row count is the
    * only broadcast, the o1 pattern). Output: per (bucket, batch) the doc
    * count, total/max length, padded cost, and packing efficiency.
    *
    * `efficiency` is defined as floor(sum_len·10⁶ / padded) / 10⁶ —
    * integer division first, ONE exact double division after — so the
    * value is bit-reproducible in any engine (a `round(sum/padded, 6)`
    * double sits on rounding-tie boundaries where Spark's BigDecimal
    * HALF_UP and DuckDB's scaled-double round disagree by one ulp; see
    * COVERAGE.md "Oracle pinning").
    */
  def lengthBucketedBatches(docs: DataFrame, lenCol: String,
      tieBreak: String, nBuckets: Int, batchSize: Int): DataFrame = {
    val numbered = globalRowNumber(docs, lenCol, tieBreak)
    val total = numbered.agg(count(lit(1)).as("_n"))
    numbered.crossJoin(broadcast(total))
      .withColumn("bucket",
        expr(s"(rn - 1) * $nBuckets div _n").cast("int"))
      // Closed-form bucket start: the smallest 0-based index m with
      // (m·nb) div N = b is ceil(b·N/nb) — integer-only, oracle-exact.
      .withColumn("_bstart",
        expr(s"(bucket * _n + ${nBuckets - 1}) div $nBuckets"))
      .withColumn("batch",
        expr(s"((rn - 1) - _bstart) div $batchSize").cast("int"))
      .groupBy("bucket", "batch")
      .agg(count(lit(1)).as("n_docs"), sum(col(lenCol)).as("sum_len"),
        max(col(lenCol)).as("max_len"))
      .withColumn("padded", col("max_len") * col("n_docs"))
      .withColumn("efficiency",
        expr("(sum_len * 1000000) div padded").cast("double") / 1e6)
  }

  /** PER-GROUP equal-frequency rank buckets (the CCNet head/middle/tail
    * split shape: per language, tertile the corpus by LM score): adds
    * `grank` (1-based rank of the row within its group in ascending
    * (orderCol, tieBreak) order) and `bucket` = ((grank−1)·nBuckets) div
    * group_count — pure integer arithmetic, bit-reproducible in any
    * engine.
    *
    * Scale shape: ONE [[globalRowNumber]] pass over the composite
    * (group, order, tieBreak) sort key — groups land contiguous in the
    * global order, so per-group rank is `rn − min(rn in group) + 1` via a
    * broadcast of the per-group offsets (O(#groups) rows; a per-group
    * `Window.partitionBy(group)` would instead put EVERY row of the
    * largest group in one task — the classic skew wall when one language
    * is 60 % of the corpus).
    */
  def rankBuckets(df: DataFrame, grpCol: String, orderCol: String,
      tieBreak: String, nBuckets: Int): DataFrame = {
    val numbered = globalRowNumber(df,
      Seq(col(grpCol), col(orderCol), col(tieBreak)), -1)
    val offsets = numbered.groupBy(grpCol)
      .agg(min("rn").as("_gmin"), count(lit(1)).as("_gcnt"))
    numbered.join(broadcast(offsets), grpCol)
      .withColumn("grank", col("rn") - col("_gmin") + lit(1L))
      .withColumn("bucket",
        expr(s"((grank - 1) * $nBuckets) div _gcnt").cast("int"))
      .drop("rn", "_gmin", "_gcnt")
  }

  /** CURRICULUM SHARDS (quality-staged pretraining order): split the
    * corpus into `nPhases` contiguous phases by DESCENDING `scoreCol`
    * (phase 0 = the highest-quality tranche trained first, the
    * anneal-down schedule), then cut each phase into fixed-size shards in
    * a seeded-shuffled order (training wants phase-internal randomness,
    * equal shard sizes, and bit-reproducible assignment).
    *
    * Two [[globalRowNumber]] passes — phase from the (−score, tie) rank,
    * shard from the (phase, lcg-shuffle, tie) rank minus the closed-form
    * phase start ceil(phase·N/nPhases) (the o14 bucket-start identity) —
    * so every derived id is pure integer arithmetic on parallel stages:
    * no per-phase window, no RNG state, reproducible from the row alone.
    */
  def curriculumShards(df: DataFrame, scoreCol: String, tieBreak: String,
      nPhases: Int, shardSize: Int, seed: Long): DataFrame = {
    val byScore = globalRowNumber(
      df.withColumn("_ord", -col(scoreCol)),
      Seq(col("_ord"), col(tieBreak)), -1)
    val total = byScore.agg(count(lit(1)).as("_n"))
    val phased = byScore.crossJoin(broadcast(total))
      .withColumn("phase", expr(s"(rn - 1) * $nPhases div _n").cast("int"))
      .withColumn("_shuf", shuffleKey(col(tieBreak), seed))
      .drop("rn", "_ord")
    globalRowNumber(phased,
      Seq(col("phase"), col("_shuf"), col(tieBreak)), -1)
      .withColumn("_pstart",
        expr(s"(phase * _n + ${nPhases - 1}) div $nPhases"))
      .withColumn("shard",
        expr(s"((rn - 1) - _pstart) div $shardSize").cast("int"))
      .drop("rn", "_n", "_pstart", "_shuf")
  }

  /** Global running SUM of `valCol` in ascending (orderCol, tieBreak)
    * order, without a single-partition window — [[globalRowNumber]]'s
    * range-partition + per-partition-offset machinery with the offsets
    * carrying partial SUMS instead of counts. Adds `cum` = Σ valCol over
    * every row at or before this one in the global order. The offsets
    * aggregate is O(#partitions); every other stage is parallel — the
    * scalable form of `sum() OVER (ORDER BY ...)`, which Spark would
    * otherwise execute as a one-task global window.
    */
  def globalCumSum(df: DataFrame, valCol: String, orderCol: String,
      tieBreak: String, numParts: Int = -1): DataFrame =
    globalCumSum(df, valCol, Seq(col(orderCol), col(tieBreak)), numParts)

  /** Multi-column form of [[globalCumSum]]: running sum in ascending
    * `sortCols` order (direction expressions like `col.desc` are honored;
    * the combination must be a TOTAL order or the prefix sums are
    * layout-dependent). Same shape: range-partition on the sort key,
    * window within partitions, per-partition totals added via a
    * #partitions-row broadcast — no single-task global window.
    */
  def globalCumSum(df: DataFrame, valCol: String, sortCols: Seq[Column],
      numParts: Int): DataFrame = {
    val parts = if (numParts > 0) numParts
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = df.repartitionByRange(parts, sortCols: _*)
      .withColumn("_part", spark_partition_id())
      .persistTracked()
    val w = Window.partitionBy("_part").orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val summed = ranged.withColumn("_psum", sum(col(valCol)).over(w))
    val offsets = ranged.groupBy("_part").agg(sum(col(valCol)).as("_ptot"))
      .withColumn("_offset",
        coalesce(sum(col("_ptot")).over(
          Window.orderBy("_part").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("_part", "_offset")
    summed.join(broadcast(offsets), "_part")
      .withColumn("cum", col("_offset") + col("_psum"))
      .drop("_part", "_psum", "_offset")
  }

  /** SNAKE-ORDER BALANCED SHARDS — equal-SIZE shards, not equal-count:
    * rank by size descending, deal rank r to shard (r−1) mod n on even
    * passes and its mirror on odd passes (boustrophedon). Each
    * consecutive 2n-block contributes exactly (size_i + size_{2n+1−i})
    * per shard, so shard totals track each other to within one block —
    * the distributed stand-in for greedy LPT (which is inherently
    * sequential). The training-export complement of [[shardedExport]]
    * (balanced row COUNTS): when sequence lengths are skewed, equal
    * counts give unequal token work per shard; this bounds the spread.
    */
  def snakeShards(df: DataFrame, sizeCol: String, idCol: String,
      nShards: Int): DataFrame = {
    require(nShards >= 1, "snakeShards needs nShards >= 1")
    globalRowNumber(df.withColumn("_negsz", -col(sizeCol)),
        Seq(col("_negsz"), col(idCol)), -1)
      .drop("_negsz")
      .withColumn("shard",
        expr(s"""CAST(CASE WHEN ((rn - 1) div $nShards) % 2 = 0
                 |  THEN (rn - 1) % $nShards
                 |  ELSE ${nShards - 1} - ((rn - 1) % $nShards) END AS INT)
                 |""".stripMargin))
  }

  /** Deterministic seeded global permutation — the training-order shuffle
    * every epoch of a data pipeline needs, reproducible across engines,
    * partitionings, and reruns (unlike `rand(seed)`, whose draw depends on
    * partition layout). `rn` is the row's position in the shuffled order,
    * assigned via the same range-partitioned scalable row number as
    * [[exact]] — no single-partition window at any size.
    */
  def shuffleOrder(df: DataFrame, keyCol: String, seed: Long): DataFrame = {
    val keyed = df.withColumn("_shuf", shuffleKey(col(keyCol), seed))
    globalRowNumber(keyed, "_shuf", keyCol).drop("_shuf")
  }

  /** Deterministic EXACT-k uniform sample of the whole frame: the k rows
    * whose seeded LCG key ranks smallest (ties → keyCol). Same draw as
    * [[shuffleOrder]]'s prefix, but the plan never ranks the corpus:
    * `orderBy(...).limit(k)` lowers to TakeOrderedAndProject — each task
    * keeps a k-row heap and the driver merges #partitions·k candidates —
    * so a 100 TB table pays one scan and no shuffle, where shuffleOrder
    * (or any window) would range-partition every row just to discard all
    * but k. The "inspect a fixed-size slice" primitive: eval panels,
    * spot-check batches, debugging samples — reproducible across engines,
    * partitionings, and reruns.
    */
  def sampleExactK(df: DataFrame, keyCol: String, k: Int, seed: Long): DataFrame = {
    require(k >= 1, "sampleExactK needs k >= 1")
    df.withColumn("_shuf", shuffleKey(col(keyCol), seed))
      .orderBy(col("_shuf"), col(keyCol))
      .limit(k)
      .drop("_shuf")
  }

  /** IMPORTANCE RESAMPLING via seeded Gumbel top-k — the selection leg of
    * DSIR (Xie et al. 2023 §2.2 sample documents ∝ w(x) WITHOUT
    * replacement; Efraimidis & Spirakis 2006 / the Gumbel-top-k trick:
    * that distribution is exactly the top-n of log w(x) + G_x with G_x
    * i.i.d. Gumbel(0,1)). Composes with [[graft.ops.TextOps.dsirLogWeights]]:
    * weights in, the resampled corpus slice out.
    *
    * The Gumbel draw is G = −ln(−ln(u)) with u = (polyhash(seed ++
    * digits(id)) + 0.5) / p — a per-row polynomial STRING hash, not a
    * single LCG step: one affine step would make consecutive ids'
    * uniforms an arithmetic lattice (u_{i+1} − u_i ≡ a/m for every i),
    * visibly correlating which neighbors get selected, while the
    * digit-decomposed rolling hash is nonlinear in the id. Engine-
    * agnostic integer arithmetic, partition-layout-independent, so the
    * selected SET is reproducible across engines and reruns —
    * `rand(seed)` or sampleBy would be neither retry-safe nor
    * oracle-checkable (DeterminismAuditSpec class).
    *
    * Scale shape: one narrow map adds the key, then a global top-n via
    * sort+limit = TakeOrderedAndProject — each partition keeps its own
    * top-n heap and the driver merges #partitions heads; the corpus is
    * never shuffled or globally sorted. FP pinning: ln agrees across
    * engines to ~1 ulp; the key rounds to 6 dp (COVERAGE.md conventions).
    */
  def gumbelTopK(weighted: DataFrame, idCol: String, logWCol: String,
      n: Int, seed: Long): DataFrame = {
    val h = Hashing.polyHash(
      concat(lit(s"$seed-"), col(idCol).cast("string")))
    val u = (h.cast("double") + lit(0.5)) / lit(Hashing.PolyMod.toDouble)
    weighted
      .withColumn("gumbel_key", round(col(logWCol) - log(-log(u)), 6))
      .orderBy(col("gumbel_key").desc, col(idCol))
      .limit(n)
  }

  /** Exact-count deterministic split: rows with rn ≤ ⌊f·N⌋ are train. Adds
    * column `is_train`. `key` must be integral and unique per row.
    *
    * The cut ⌊f·N⌋ is a lazily-broadcast one-row aggregate, not a driver
    * `count()` — the split stays a single action, so callers that only
    * write/aggregate it don't pay a separate materializing pass (the
    * count's job) first.
    */
  def exact(df: DataFrame, keyCol: String, trainFraction: Double, seed: Long): DataFrame = {
    val keyed = df.withColumn("_shuf", shuffleKey(col(keyCol), seed))
    val numbered = globalRowNumber(keyed, "_shuf", keyCol)
    val total = numbered.groupBy().agg(count(lit(1)).as("_n"))
    numbered.crossJoin(broadcast(total))
      .withColumn("is_train",
        (col("rn") <= floor(lit(trainFraction) * col("_n"))).cast("int"))
      .drop("_shuf", "_n")
  }

  /** Stratified exact split: ⌊f·N_g⌋ train rows within EVERY stratum
    * (label/language/source), so minority classes keep their ratio — the
    * class-balance property a plain global split loses. No global sort:
    * the row number is a per-stratum window (parallel across strata) and
    * the per-stratum counts join back on the stratum key.
    */
  def stratifiedExact(df: DataFrame, stratumCol: String, keyCol: String,
      trainFraction: Double, seed: Long): DataFrame = {
    val keyed = df.withColumn("_shuf", shuffleKey(col(keyCol), seed))
    val w = Window.partitionBy(stratumCol).orderBy(col("_shuf"), col(keyCol))
    val numbered = keyed.withColumn("_grn", row_number().over(w))
    val counts = df.groupBy(stratumCol).agg(count(lit(1)).as("_gn"))
    numbered.join(broadcast(counts), stratumCol)
      .withColumn("is_train",
        (col("_grn") <= floor(lit(trainFraction) * col("_gn"))).cast("int"))
      .drop("_shuf", "_grn", "_gn")
  }

  /** Stratified K-FOLD assignment (cross-validation folds): within each
    * stratum, rows take folds round-robin in seeded-shuffle order, so
    * every (stratum, fold) cell is balanced to ±1 exactly — the
    * guarantee random assignment only approximates. Pure map + one
    * per-stratum window in (lcg, key) order (keyed shuffle, no global
    * sort); assignment is layout-independent and re-runnable.
    */
  def kFold(df: DataFrame, stratumCol: String, keyCol: String, k: Int,
      seed: Long): DataFrame = {
    require(k >= 2, "need at least 2 folds")
    val w = Window.partitionBy(stratumCol)
      .orderBy(shuffleKey(col(keyCol), seed), col(keyCol))
    df.withColumn("fold", ((row_number().over(w) - 1) % k).cast("int"))
  }

  /** Group-leakage-safe split: every row of a group (all documents from
    * one source/domain) lands in the SAME split because the assignment
    * hashes the GROUP key, not the row. The contamination-safe train/test
    * split for corpora: near-identical documents cluster within a source,
    * and a row-level split would put siblings on both sides of the eval
    * boundary. The assignment itself is a pure map — zero shuffle,
    * deterministic across runs, engines, and cluster sizes (polyhash of
    * the group value, no RNG state), so train/test membership can be
    * recomputed from the key alone anywhere in the pipeline.
    */
  def groupSplit(df: DataFrame, groupCol: String, nBuckets: Int,
      trainBuckets: Int): DataFrame =
    df.withColumn("split",
      when(pmod(Hashing.polyHash(col(groupCol)), lit(nBuckets)) < trainBuckets,
        "train").otherwise("test"))

  /** Deterministic uniform sample of (up to) k rows per key: rank by the
    * seeded per-row LCG inside each key and keep the first k. The scalable
    * form of "give me k examples per class" — one shuffle on the key, no
    * driver-side sampling state, reproducible across runs and engines.
    */
  def samplePerKey(df: DataFrame, partitionCol: String, keyCol: String,
      k: Int, seed: Long): DataFrame = {
    val w = Window.partitionBy(partitionCol)
      .orderBy(shuffleKey(col(keyCol), seed), col(keyCol))
    df.withColumn("_srn", row_number().over(w))
      .filter(col("_srn") <= k)
      .drop("_srn")
  }

  /** Temperature-smoothed domain mixing at α = 0.5 — the multilingual /
    * multi-domain pretraining standard (exponential smoothing of domain
    * proportions, as in XLM / mT5): domain d's sampling quota is
    * ∝ n_d^α, which UP-samples small domains relative to proportional
    * mixing so one giant web crawl can't drown the tails. Budget K =
    * (N·budgetNum) div budgetDen rows total. Because a √-boosted tail
    * quota can exceed the tail's own size, quotas are WEIGHTED
    * WATER-FILLING with caps (the UniMax-style allocation, Chung et al.
    * 2023, at a 1-epoch cap): quota_d = min(n_d, w_d·λ) with the level λ
    * chosen so Σ quota = K exactly — saturated tails contribute every row
    * they have and the surplus flows to the unsaturated domains, still
    * ∝ w_d. The selection inside each domain is the deterministic seeded
    * order of [[samplePerKey]].
    *
    * EXACT-ARITHMETIC allocation, closed form, no iteration: sort domains
    * by capping priority n_d/w_d ascending (scaled-integer key); with
    * prefix sums P(<d) of caps and suffix sums W(≥d) of weights, domain d
    * saturates iff w_d·(K − P) ≥ n_d·W — an integer comparison; the
    * saturated set is a prefix of the sort order, so ONE window pass
    * decides it. The residual budget then splits over the unsaturated
    * domains by integer division + largest remainder (ranked by the exact
    * BIGINT remainder, ties → domain). n^0.5 itself is the integer square
    * root of n·sqrtScale (double sqrt + one-step fixup — exact, since
    * IEEE sqrt is within 1 ulp). No FP anywhere a quota could flip:
    * bit-reproducible in any engine (COVERAGE.md "Oracle pinning").
    * Pick sqrtScale so isqrt(maxN·sqrtScale)·K < 2⁶³ (default 10¹² is
    * safe through ~10⁷-row domains at a 40% budget; lower it for larger
    * corpora — quotas only need α-proportionality, not precision).
    *
    * Scale shape: one groupBy to the #domains-row count frame; every
    * window after that is bounded by #domains (metadata cardinality) —
    * never corpus-wide; the quota table broadcasts back; the per-domain
    * selection is one window partitioned BY domain. The heavy path is
    * exactly o6's sample-per-key shape.
    */
  def temperatureMix(df: DataFrame, domainCol: String, keyCol: String,
      budgetNum: Long, budgetDen: Long, seed: Long,
      sqrtScale: Long = 1000000000000L): DataFrame = {
    val counts = df.groupBy(domainCol).agg(count(lit(1)).as("n"))
    val quotas = waterFillQuotas(
      counts.withColumn("_s", isqrtCol(col("n"), sqrtScale)),
      domainCol, budgetNum, budgetDen)
    val ws = Window.partitionBy(domainCol)
      .orderBy(shuffleKey(col(keyCol), seed), col(keyCol))
    df.join(broadcast(quotas), domainCol)
      .withColumn("_srn", row_number().over(ws))
      .filter(col("_srn") <= col("quota"))
      .drop("_srn")
  }

  /** Exact integer square root of n·scale as a Column: IEEE double sqrt is
    * within 1 ulp, so floor of it is off by at most one — one integer
    * fixup in each direction makes it exact for any input.
    */
  def isqrtCol(n: Column, scale: Long): Column = {
    val x = n * lit(scale)
    val t0 = floor(sqrt(x.cast("double"))).cast("long")
    val t1 = when(t0 * t0 > x, t0 - 1).otherwise(t0)
    when((t1 + 1) * (t1 + 1) <= x, t1 + 1).otherwise(t1)
  }

  /** The exact-integer capped water-filling allocator shared by
    * [[temperatureMix]] (caps = doc counts) and [[tokenBudgetMix]]
    * (caps = token masses): input is a #domains-row frame with columns
    * (domainCol, `n` = cap, `_s` = weight); output (domainCol, n_domain,
    * quota) with quota_d = min(n_d, w_d·λ), λ the level spending
    * K = (Σn·budgetNum) div budgetDen exactly. See [[temperatureMix]]'s
    * scaladoc for the closed-form saturation scan.
    */
  private[ops] def waterFillQuotas(weighted0: DataFrame, domainCol: String,
      budgetNum: Long, budgetDen: Long): DataFrame = {
    // N.B. Spark resolves column names case-insensitively: _stot, not _S.
    val weighted = weighted0.withColumn("_pri", expr("(n * 1000000) div _s"))
    val tot = weighted.agg(sum("n").as("_ntot"))
    // Windows below are bounded by the DOMAIN count (tens), never the
    // corpus — the same bounded-global-window shape as the o1 offsets.
    val ord = Window.orderBy(col("_pri"), col(domainCol))
    // localCheckpoint (the model-frame discipline, as in kmeans fitOn):
    // the saturation frame feeds THREE consumers (residual totals,
    // leftover count, final quotas) — without the cut each consumer's
    // plan re-embeds the whole subtree and the corpus-count groupBy
    // executes once per copy (observed 7 one-row BNLJ attaches vs 3).
    // The frame is #domains rows; its blocks are ContextCleaner-owned.
    val scanned = weighted.crossJoin(broadcast(tot))
      .withColumn("_K", expr(s"(_ntot * $budgetNum) div $budgetDen"))
      .withColumn("_pc", coalesce(
        sum("n").over(ord.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("_ws",
        sum("_s").over(ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .withColumn("_sat",
        col("_s") * (col("_K") - col("_pc")) >= col("n") * col("_ws"))
      .localCheckpoint()
    val res = scanned.agg(
      (max("_K") - sum(when(col("_sat"), col("n")).otherwise(0L))).as("_R"),
      sum(when(col("_sat"), 0L).otherwise(col("_s"))).as("_W"))
    val based = scanned.crossJoin(broadcast(res))
      .withColumn("_q0", when(col("_sat"), col("n"))
        .otherwise(expr("(_s * _R) div _W")))
      .withColumn("_rem", when(col("_sat"), lit(-1L))
        .otherwise(col("_s") * col("_R") - col("_q0") * col("_W")))
    val leftover = based.agg((max("_K") - sum("_q0")).as("_L"))
    val rk = Window.orderBy(col("_rem").desc, col(domainCol))
    based.crossJoin(broadcast(leftover))
      .withColumn("_rk", row_number().over(rk))
      // least(…, n) is a SAFETY cap only: with the exact priority order
      // the water-filling already keeps every share ≤ n.
      .withColumn("quota", least(
        col("_q0") + when(col("_rk") <= col("_L"), 1L).otherwise(0L),
        col("n")))
      .select(col(domainCol), col("n").as("n_domain"), col("quota"))
  }

  /** TOKEN-budget domain mixing — [[temperatureMix]] with the budget in
    * the unit pretraining mixtures are actually specified in: each domain
    * gets a TOKEN budget ∝ √(its token mass) (α = 0.5 smoothing, capped
    * water-filling — a tail domain whose √-boosted budget exceeds its
    * own token mass contributes everything, surplus flows on, Σ budgets
    * = K tokens exactly), and fills it GREEDILY BY QUALITY: docs ordered
    * (ordCol asc, tieCol) inside each domain, kept while the running
    * token total fits the budget — o13's token-budget cut, per domain.
    * Documents are atomic, so a domain may undershoot its budget by at
    * most one document's tokens.
    *
    * sqrtScale trade-off: weights are isqrt(tokens·scale); pick scale so
    * isqrt(maxDomainTokens·scale)·K < 2⁶³ — the 10⁶ default is safe to
    * ~10¹²-token domains at a 40% budget (quotas need α-proportionality,
    * not absolute precision). Scale shape: allocation on the
    * #domains-row frame (bounded windows); the corpus-scale work is one
    * keyed broadcast join + one per-domain running-sum window.
    */
  def tokenBudgetMix(df: DataFrame, domainCol: String, tokCol: String,
      ordCol: String, tieCol: String, budgetNum: Long, budgetDen: Long,
      sqrtScale: Long = 1000000L): DataFrame = {
    val caps = df.groupBy(domainCol).agg(sum(col(tokCol)).as("n"))
    val quotas = waterFillQuotas(
      caps.withColumn("_s", isqrtCol(col("n"), sqrtScale)),
      domainCol, budgetNum, budgetDen)
    val w = Window.partitionBy(domainCol).orderBy(col(ordCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    df.join(broadcast(quotas.withColumnRenamed("n_domain", "tok_domain")),
        domainCol)
      .withColumn("_cum", sum(col(tokCol)).over(w))
      .filter(col("_cum") <= col("quota"))
      .withColumnRenamed("quota", "tok_budget")
      .drop("_cum")
  }

  /** DATA-CONSTRAINED epoch allocation (Muennighoff et al. 2023, "Scaling
    * data-constrained language models"): when the token budget
    * K = total·budgetNum/budgetDen EXCEEDS one pass over the preferred
    * mixture, domains REPEAT — up to `capEpochs` epochs, the published
    * operating point past which repeated data stops paying. Desired
    * shares are uniform across domains (the max-upsampling mixture: every
    * domain is asked for K/#domains tokens, ±1 apportioned by domain
    * order so Σ desired = K exactly); a domain delivers
    * emitted = min(desired, capEpochs·n_tok) — an oversized domain
    * subsamples (epochs < 1), an undersized one repeats to the cap and
    * REPORTS the unmet remainder rather than silently reassigning it
    * (the reassignment policy — more epochs vs. other domains vs. less
    * budget — is the caller's modeling decision, not this operator's).
    *
    * Output per domain: (n_tok, desired_tok, emitted_tok,
    * epochs_e6 = emitted·10⁶ div n_tok, unmet_tok). All integer — no FP
    * anywhere a token count could flip. Overflow bound: emitted·10⁶ must
    * fit a BIGINT — safe through ~10¹²-token domains.
    *
    * Scale shape: one corpus groupBy to the #domains-row frame; the
    * apportionment window is bounded by the domain count (metadata
    * cardinality), never the corpus.
    */
  def epochMix(df: DataFrame, domainCol: String, tokCol: String,
      budgetNum: Long, budgetDen: Long, capEpochs: Int): DataFrame = {
    val caps = df.groupBy(domainCol).agg(sum(col(tokCol)).as("n_tok"))
    val tot = caps.agg(sum("n_tok").as("_ttot"), count(lit(1)).as("_nd"))
    val ord = Window.orderBy(col(domainCol))
    caps.crossJoin(broadcast(tot))
      .withColumn("_K", expr(s"(_ttot * $budgetNum) div $budgetDen"))
      .withColumn("_rk", row_number().over(ord))
      .withColumn("desired_tok", expr("_K div _nd") +
        when(col("_rk") <= expr("_K % _nd"), 1L).otherwise(0L))
      .withColumn("emitted_tok",
        least(col("desired_tok"), lit(capEpochs.toLong) * col("n_tok")))
      .withColumn("epochs_e6", expr("(emitted_tok * 1000000) div n_tok"))
      .withColumn("unmet_tok", col("desired_tok") - col("emitted_tok"))
      .select(col(domainCol), col("n_tok"), col("desired_tok"),
        col("emitted_tok"), col("epochs_e6"), col("unmet_tok"))
  }

  /** Sharded training export — the pipeline's final materialization: every
    * row gets a deterministic shard from its position in the seeded global
    * shuffle order (shard = (rn−1) % nShards), which gives exact ±1 shard
    * balance AND makes each shard an interleaved sample of the shuffled
    * order — shard files double as training-order streams, the layout a
    * loader consumes shard-at-a-time. The frame is WRITTEN partitioned by
    * shard and the export is read BACK as the return value, so a caller's
    * rollup verifies the on-disk files, not the pre-write plan. Scale:
    * one range shuffle (the scalable row number), one repartition bounding
    * writer fan-out to nShards tasks, no global window, no driver state.
    */
  def shardedExport(df: DataFrame, keyCol: String, nShards: Int, seed: Long,
      outDir: String): DataFrame = {
    shuffleOrder(df, keyCol, seed)
      .withColumn("shard", ((col("rn") - 1) % nShards).cast("int"))
      .repartition(nShards, col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    df.sparkSession.read.parquet(outDir)
  }

  /** o26: SEQUENCE-PACKING report — the GPT-pretraining packing contract:
    * the corpus token stream is CONCATENATED in document-id order and
    * sliced into fixed `ctxLen`-token context windows; a document
    * crossing a boundary continues in the next window (no padding, no
    * doc-level bin packing — the standard "concat and chunk" recipe).
    * Output, one row per window: `n_docs` = segments sharing the window
    * (the attention-mask segment count — the operational statistic:
    * windows with many tiny segments dilute long-range context),
    * `n_tokens` (= ctxLen everywhere except the final partial window),
    * and the first/last document ids touching it.
    *
    * Scale shape: ONE [[globalCumSum]] pass gives every document its
    * token interval [cum − n, cum) in the stream (range partition +
    * #partitions-row offsets — no single-task window); the window fan-out
    * is a narrow explode bounded by n/ctxLen + 1 per doc; the rollup is
    * one keyed groupBy on the window id with map-side combine. All-integer
    * interval math — bit-reproducible in any engine.
    */
  def packSequences(docs: DataFrame, textCol: String, idCol: String,
      ctxLen: Int): DataFrame =
    packedSegments(docs, textCol, idCol, ctxLen)
      .groupBy("bin_id")
      .agg(count(lit(1)).as("n_docs"), sum("_t").as("n_tokens"),
        min(col(idCol)).as("first_doc"), max(col(idCol)).as("last_doc"))

  /** o27: PACKED-WINDOW SEGMENT MANIFEST — the dataloader-facing export
    * leg of [[packSequences]]: one row per (window, document) SEGMENT of
    * the same concat-and-chunk assignment, carrying exactly what a
    * trainer's loader needs to materialize window `bin_id` without ever
    * re-running the packing pass:
    *   - `doc_offset`: the segment's first token's offset WITHIN the
    *     document (0 unless the doc continued across a window boundary),
    *   - `win_offset`: where the segment starts WITHIN the window (the
    *     attention-mask segment boundary),
    *   - `len`: segment token count (win_offset + len ≤ ctxLen always).
    * The o26 report is this manifest's per-window rollup — n_docs =
    * count, n_tokens = sum(len), first/last = min/max doc — and
    * SplitFeaturesSpec pins that identity, so report and manifest can
    * never disagree.
    *
    * Scale shape: identical to o26 (the SAME one-cumsum segment pass —
    * range partition + #partitions-row offsets, narrow bounded explode),
    * minus o26's rollup: the manifest is emitted straight out of the
    * map side, ~⌈n/ctxLen⌉+1 rows per document, all-integer arithmetic.
    */
  def packManifest(docs: DataFrame, textCol: String, idCol: String,
      ctxLen: Int, offset: Long = 0L): DataFrame =
    packedSegments(docs, textCol, idCol, ctxLen, offset)
      .select(col("bin_id"), col(idCol),
        (greatest(col("_s"), col("bin_id") * ctxLen) - col("_s"))
          .as("doc_offset"),
        (greatest(col("_s"), col("bin_id") * ctxLen) - col("bin_id") * ctxLen)
          .as("win_offset"),
        col("_t").as("len"))

  /** o28: PACKED TOKEN-WINDOW EXPORT — the materialized leg of the
    * packing family: o26 reports the windows, o27 manifests the segment
    * assignment, o28 WRITES the windows themselves — one row per context
    * window carrying the ordered `ctxLen`-slot token-id array (hashed
    * vocabulary: pmod(polyhash(token), vocab), the t12 feature-hashing
    * contract), which is the artifact a trainer's dataloader memory-maps.
    * The export is written to `outDir` and read BACK, and every returned
    * gate column (n_tokens, sum_tid, the space-joined id string) is
    * derived from the ON-DISK array — the o12 discipline: the oracle
    * verifies the artifact, never the pre-write plan.
    *
    * Scale shape: the SAME one-cumsum segment pass as o26/o27, plus one
    * keyed join of the token stream against its own doc's ≤ ⌈n/ctxLen⌉+1
    * segments (doc_id is the join and shuffle key), then one keyed rollup
    * on the window id whose per-group state is bounded by ctxLen slots.
    * No window function over the corpus, no driver materialization; the
    * writer fan-out is the natural task parallelism.
    */
  def packTokens(docs: DataFrame, textCol: String, idCol: String,
      ctxLen: Int, vocab: Int, outDir: String): DataFrame = {
    packedWindows(docs, textCol, idCol, ctxLen, vocab)
      .write.mode("overwrite").parquet(outDir)
    docs.sparkSession.read.parquet(outDir)
      .select(col("bin_id"),
        size(col("tokens")).cast("long").as("n_tokens"),
        col("sum_tid"),
        array_join(col("tokens").cast("array<string>"), " ").as("tok_str"))
  }

  /** The computed packed-window frame o28/o29 write: one row per context
    * window with the ordered ctxLen-slot hashed-token-id array and its
    * integer checksum.
    */
  private def packedWindows(docs: DataFrame, textCol: String, idCol: String,
      ctxLen: Int, vocab: Int): DataFrame = {
    val seg = packedSegments(docs, textCol, idCol, ctxLen)
      .select(col("bin_id"), col(idCol),
        (greatest(col("_s"), col("bin_id") * ctxLen) - col("_s"))
          .as("_doff"),
        (greatest(col("_s"), col("bin_id") * ctxLen) - col("bin_id") * ctxLen)
          .as("_woff"),
        col("_t"))
    val tok = docs.select(col(idCol),
        posexplode(graft.ops.TextOps.tokens(col(textCol)))
          .as(Seq("_pos", "_w")))
      .withColumn("_tid",
        pmod(graft.functions.Hashing.polyHash(col("_w")), lit(vocab)))
    seg.join(tok, Seq(idCol))
      .filter(col("_pos") >= col("_doff") &&
        col("_pos") < col("_doff") + col("_t"))
      .select(col("bin_id"),
        (col("_woff") + col("_pos") - col("_doff")).as("_widx"),
        col("_tid"))
      .groupBy("bin_id")
      // No per-element lambda anywhere on this corpus-scale path: the
      // ordered id array comes out of the sorted struct list via the
      // native array-of-struct field extractor + cast, and the checksum
      // is a plain codegen'd sum — the whole chain stays in whole-stage
      // codegen (PlanAuditSpec gates this).
      .agg(
        array_sort(collect_list(struct(col("_widx"), col("_tid"))))
          .getField("_tid").cast("array<int>").as("tokens"),
        sum("_tid").as("sum_tid"))
  }

  /** o29: the [[packTokens]] export in the SHARDED on-disk layout a
    * distributed dataloader actually mounts — o12's discipline completed
    * for the packing family: windows are written `partitionBy(shard)`
    * with `shard = bin_id % nShards` (exact ±1 window balance AND each
    * shard an interleaved sample of the window stream, so per-rank
    * training order stays corpus-representative — the same property
    * [[shardedExport]] gives row exports), bounded to one writer task
    * per shard directory, and every returned gate column is derived from
    * the READ-BACK files — including the shard partition column itself,
    * recovered from the directory name, so a window landing in the wrong
    * directory flips its row against the oracle's `bin_id % nShards`
    * arithmetic (SplitFeaturesSpec additionally pins one file per shard
    * directory).
    *
    * Scale shape: [[packTokens]]'s one-cumsum segment pass + keyed
    * window rollup, then ONE repartition to nShards writer tasks (each
    * writes exactly one directory's file). nShards tracks the training
    * world size, not the corpus — the repartition is the last, bounded
    * exchange of the pipeline.
    */
  def packTokensSharded(docs: DataFrame, textCol: String, idCol: String,
      ctxLen: Int, vocab: Int, nShards: Int, outDir: String): DataFrame = {
    require(nShards > 0, "packTokensSharded needs nShards > 0")
    packedWindows(docs, textCol, idCol, ctxLen, vocab)
      .withColumn("shard",
        pmod(col("bin_id"), lit(nShards.toLong)).cast("int"))
      .repartition(nShards, col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    docs.sparkSession.read.parquet(outDir)
      .select(col("bin_id"), col("shard").cast("int").as("shard"),
        size(col("tokens")).cast("long").as("n_tokens"),
        col("sum_tid"),
        array_join(col("tokens").cast("array<string>"), " ").as("tok_str"))
  }

  /** Shared segment pass of [[packSequences]]/[[packManifest]]: per
    * (document, context window) overlap row. ONE [[globalCumSum]] gives
    * every document its token interval [_s, cum) in the doc-id-ordered
    * token stream; the explode fans each doc out to the windows its
    * interval touches (bounded by n/ctxLen + 1); `_t` is the overlap
    * length. All-integer interval math — bit-reproducible in any engine.
    */
  private def packedSegments(docs: DataFrame, textCol: String,
      idCol: String, ctxLen: Int, offset: Long = 0L): DataFrame = {
    require(ctxLen > 0, "packSequences needs ctxLen > 0")
    val withTok = docs.select(col(idCol),
      size(graft.ops.TextOps.tokens(col(textCol))).cast("long").as("_nt"))
    // `offset` shifts the whole batch's token intervals: a stream that has
    // already packed `offset` tokens continues mid-window exactly where it
    // stopped (e20's per-micro-batch carry); batch callers leave it at 0.
    globalCumSum(withTok, "_nt", idCol, idCol)
      .filter(col("_nt") > 0)
      .withColumn("_e", col("cum") + lit(offset))
      .withColumn("_s", col("_e") - col("_nt"))
      .withColumn("bin_id",
        explode(sequence(expr(s"_s div $ctxLen"),
          expr(s"(_e - 1) div $ctxLen"))))
      .withColumn("_t",
        least(col("_e"), (col("bin_id") + 1) * ctxLen)
          - greatest(col("_s"), col("bin_id") * ctxLen))
  }
}
