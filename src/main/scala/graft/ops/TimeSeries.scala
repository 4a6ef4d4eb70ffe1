package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Caches.Registered

/** Time-series regularization: per-key daily resample + gap-fill with
  * linear interpolation. The reference's domain is exactly this shape — a
  * per-station daily temperature series with missing days that must become
  * a dense 365-vector (see `/root/reference/feature_extractor.py`'s
  * assembly loop); this operator is the general distributed form.
  *
  * Scale shape: one groupBy to the daily grain, one groupBy for per-key
  * bounds, a `sequence()` explode for the spine (rows = keys × span days —
  * never wider than the filled output itself), one keyed left join, and two
  * per-key ordered windows. Everything is partitioned by the series key, so
  * a 100 TB corpus with millions of keys parallelizes per key; no window
  * ever sees more than one key's span.
  */
object TimeSeries {

  /** Dense daily series per key: observed days carry the daily mean of
    * `valCol`; missing interior days are linearly interpolated between the
    * nearest observed neighbors; leading/trailing gaps (none at the daily
    * grain, since bounds come from observed days) would clamp to the
    * nearest observed value. Output: key, d (date), v_filled (6 dp),
    * interpolated flag.
    */
  def gapFillDaily(df: DataFrame, keyCol: String, tsCol: String, valCol: String): DataFrame = {
    val daily = df.groupBy(col(keyCol), to_date(col(tsCol)).as("d"))
      .agg(avg(col(valCol)).as("v"))
    val spine = daily.groupBy(col(keyCol))
      .agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      .select(col(keyCol), explode(sequence(col("d0"), col("d1"))).as("d"))
    val joined = spine.join(daily, Seq(keyCol, "d"), "left")

    val wPrev = Window.partitionBy(keyCol).orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(keyCol).orderBy("d")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val pv = last(col("v"), ignoreNulls = true).over(wPrev)
    val pd = last(when(col("v").isNotNull, col("d")), ignoreNulls = true).over(wPrev)
    val nv = first(col("v"), ignoreNulls = true).over(wNext)
    val nd = first(when(col("v").isNotNull, col("d")), ignoreNulls = true).over(wNext)

    joined.select(col(keyCol), col("d"),
      round(
        when(col("v").isNotNull, col("v"))
          .when(pv.isNull, nv) // leading gap: backfill
          .when(nv.isNull, pv) // trailing gap: forward-fill
          .otherwise(pv + (nv - pv) *
            (datediff(col("d"), pd).cast("double") / datediff(nd, pd))),
        6).as("v_filled"),
      col("v").isNull.as("interpolated"))
  }

  /** Trailing-window rolling statistics + anomaly flag over the per-key
    * daily series: 7-day RANGE frame (calendar days, not rows — gaps in
    * the series shrink the window, exactly what a sensor pipeline wants),
    * mean/stddev_pop/count, and a 2σ spike flag (suppressed until the
    * window has ≥3 observations). Partitioned per key — no global sort;
    * the RANGE frame keys on the integer epoch-day so the frame bound is
    * O(1) arithmetic, not an interval probe.
    */
  def rollingDailyStats(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String, windowDays: Int = 7): DataFrame = {
    val daily = df.groupBy(col(keyCol), to_date(col(tsCol)).as("d"))
      .agg(avg(col(valCol)).as("v"))
      .withColumn("di", datediff(col("d"), to_date(lit("1970-01-01"))))
    val win = Window.partitionBy(keyCol).orderBy("di")
      .rangeBetween(-(windowDays - 1), Window.currentRow)
    daily.select(col(keyCol), col("d"), round(col("v"), 6).as("v_day"),
      count(lit(1)).over(win).as("n_win"),
      round(avg(col("v")).over(win), 6).as("trail_avg"),
      round(stddev_pop(col("v")).over(win), 6).as("trail_sd"),
      (abs(col("v") - avg(col("v")).over(win)) >
        lit(2) * stddev_pop(col("v")).over(win) &&
        count(lit(1)).over(win) >= 3).as("anomaly"))
  }

  /** Exponentially-weighted moving average over the per-key daily series —
    * the trend baseline an anomaly monitor compares against (ts2's
    * rolling window forgets abruptly; EWMA forgets geometrically). ALL
    * INTEGER: the daily value snaps to e6 (the family's 6-dp pin) and the
    * recurrence s_t = (num·v_t + (den−num)·s_{t−1}) div den runs in
    * BIGINTs, so the smoothed series is bit-identical in any engine — no
    * pow(), no double accumulation. Values are OFFSET into strictly
    * positive territory before the fold and shifted back after: integer
    * EWMA is exactly affine in a constant (floor((x+C·w)/w) = floor(x/w)+C),
    * and positive-only division sidesteps the Spark-truncates /
    * DuckDB-floors divergence on negatives.
    *
    * Scale shape: one daily aggregate, then ONE shuffle per key to a
    * sorted array fold — the recurrence is inherently sequential per key,
    * but a key's day count is calendar-bounded, so the per-key O(d²)
    * prefix folds are a few hundred thousand integer ops at worst.
    * Parallelism is across keys, the only axis that grows at 100 TB.
    * For LONG histories (multi-year keys) use [[ewmaDailyChunked]]: the
    * same recurrence folded chunk-by-chunk through the seeded carry,
    * O(d · chunkDays) instead of O(d²).
    */
  def ewmaDaily(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String, alphaNum: Int = 3, alphaDen: Int = 10): DataFrame = {
    val daily = dailyE6(df, keyCol, tsCol, valCol)
    ewmaDailySeeded(daily, freshState(daily, keyCol), keyCol,
      alphaNum, alphaDen).drop("_ewma_off")
  }

  /** The empty (key, _s_off) state frame a fresh (unseeded) fold starts
    * from — schema-only, derived from the daily frame itself.
    */
  private def freshState(of: DataFrame, keyCol: String): DataFrame =
    of.select(col(keyCol), lit(null).cast("long").as("_s_off")).limit(0)

  /** The e6-snapped per-key daily series [[ewmaDailySeeded]] folds. */
  def dailyE6(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String): DataFrame =
    df.groupBy(col(keyCol), to_date(col(tsCol)).as("d"))
      .agg(round(round(avg(col(valCol)), 6) * lit(1e6), 0)
        .cast("long").as("v_e6"))

  /** Offset applied before every fold (see [[ewmaDaily]]'s scaladoc). */
  val EwmaOffset = 1000000000000L

  /** [[ewmaDaily]]'s fold, SEEDED per key: rows of `state`
    * (key, _s_off — the prior EWMA in OFFSET space) continue their
    * key's recurrence as if the earlier days were present; absent keys
    * start fresh. This is the incremental form a micro-batch lifecycle
    * needs — fold today's arrivals on top of yesterday's standing state
    * and the output must equal the full-history recurrence (the e15
    * gate). Emits `_ewma_off` alongside the public columns so the caller
    * can harvest the new state (max-date row per key) without undoing
    * the offset.
    */
  def ewmaDailySeeded(daily: DataFrame, state: DataFrame, keyCol: String,
      alphaNum: Int = 3, alphaDen: Int = 10): DataFrame =
    ewmaSeededFromArr(ewmaArr(daily, state, keyCol), keyCol,
      alphaNum, alphaDen)

  /** Shared grouped frame of the seeded fold: per key the date-sorted
    * (d, v_e6) array with the prior `_s_off` state attached. Split out so
    * the chunked loop can derive BOTH the chunk output and the carried
    * state from one grouped frame (one groupBy per chunk, not two).
    */
  private def ewmaArr(daily: DataFrame, state: DataFrame,
      keyCol: String): DataFrame =
    daily.groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col("d"), col("v_e6")))).as("a"))
      .join(state.select(col(keyCol), col("_s_off")), Seq(keyCol), "left")

  /** [[ewmaDailySeeded]]'s per-row fold over the [[ewmaArr]] frame. */
  private def ewmaSeededFromArr(arr: DataFrame, keyCol: String,
      alphaNum: Int, alphaDen: Int): DataFrame = {
    require(alphaNum > 0 && alphaNum < alphaDen, "need 0 < alpha < 1")
    val Off = EwmaOffset
    arr.select(col(keyCol), explode(expr(
        s"""transform(a, (x, i) -> named_struct(
           |  'd', x.d,
           |  'v_e6', x.v_e6,
           |  '_ewma_off', aggregate(
           |      slice(transform(a, z -> z.v_e6 + ${Off}L),
           |        CASE WHEN _s_off IS NULL THEN 2 ELSE 1 END,
           |        i + CASE WHEN _s_off IS NULL THEN 0 ELSE 1 END),
           |      coalesce(_s_off,
           |        element_at(transform(a, z -> z.v_e6 + ${Off}L), 1)),
           |      (acc, y) -> (${alphaNum}L * y
           |        + ${alphaDen - alphaNum}L * acc) div ${alphaDen}L)))"""
        .stripMargin)).as("r"))
      .select(col(keyCol), col("r.d").as("d"), col("r.v_e6").as("v_e6"),
        (col("r._ewma_off") - lit(Off)).as("ewma_e6"),
        col("r._ewma_off").as("_ewma_off"))
  }

  /** The post-chunk state in ONE O(len) whole-array fold over the
    * [[ewmaArr]] frame — the same recurrence, the same slice/seed rule as
    * [[ewmaSeededFromArr]] at i = size−1 (its max-date row), without
    * re-running the O(len²) per-row transform and a second groupBy over
    * the chunk output just to harvest the last element.
    */
  private def ewmaChunkState(arr: DataFrame, keyCol: String,
      alphaNum: Int, alphaDen: Int): DataFrame = {
    require(alphaNum > 0 && alphaNum < alphaDen, "need 0 < alpha < 1")
    val Off = EwmaOffset
    arr.select(col(keyCol), expr(
      s"""aggregate(
         |    slice(transform(a, z -> z.v_e6 + ${Off}L),
         |      CASE WHEN _s_off IS NULL THEN 2 ELSE 1 END,
         |      size(a) - CASE WHEN _s_off IS NULL THEN 1 ELSE 0 END),
         |    coalesce(_s_off,
         |      element_at(transform(a, z -> z.v_e6 + ${Off}L), 1)),
         |    (acc, y) -> (${alphaNum}L * y
         |      + ${alphaDen - alphaNum}L * acc) div ${alphaDen}L)"""
        .stripMargin).as("_s_off"))
  }

  /** ONE-SIDED CUSUM drift detection over the per-key daily series — the
    * change-point counterpart of [[rollingDailyStats]]'s local anomaly
    * flag: a rolling 2σ test sees SPIKES but is blind to a small
    * persistent mean SHIFT (a sensor drifting, a source's quality
    * sliding), which is exactly what the cumulative statistic
    *
    *   S⁺_t = max(0, S⁺_{t−1} + (v_t − μ))
    *
    * ramps on (Page 1954). μ is the key's own integer mean; the alarm
    * threshold is self-scaling at hMult × (max−min) of the key's daily
    * values — a stationary series' S⁺ stays inside its range, a shifted
    * mean ramps past any fixed multiple of it. One summary row per key:
    * days, mean, peak statistic, alarm-day count, first alarm date.
    *
    * Numerics: the ts3 discipline — all-BIGINT recurrence over the
    * e6-snapped daily series, so the statistic (not just its inputs) is
    * bit-identical cross-engine. Requires nonnegative daily values (the
    * mean uses one floor division; Spark `div` truncates where DuckDB
    * floors on NEGATIVE operands).
    *
    * Scale shape: per-key collect + in-row prefix folds (O(days²) per
    * key, calendar-bounded like ts3/ewma); parallelism is across keys —
    * the axis that grows at 100 TB. The readout Project is
    * post-aggregation (#keys rows), allowlisted in PlanAuditSpec like
    * v5's centroid readout. For LONG histories use [[cusumDailyChunked]]:
    * the same recurrence with a five-field carry folded across fixed
    * chunks, O(d · chunkDays) instead of O(d²).
    */
  def cusumDaily(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String, hMult: Int = 1): DataFrame =
    cusumFromDaily(dailyE6(df, keyCol, tsCol, valCol), keyCol, hMult)

  /** [[cusumDaily]] over a PRECOMPUTED [[dailyE6]] frame (the auto
    * router's reuse seam).
    */
  private def cusumFromDaily(daily: DataFrame, keyCol: String,
      hMult: Int): DataFrame = {
    require(hMult >= 1, "cusumDaily needs hMult >= 1")
    daily
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col("d"), col("v_e6")))).as("a"))
      .withColumn("_vs", expr("transform(a, z -> z.v_e6)"))
      .withColumn("n_days", size(col("a")).cast("long"))
      .withColumn("mu_e6",
        expr("aggregate(_vs, 0L, (acc, y) -> acc + y) div size(a)"))
      .withColumn("_s", expr(
        """transform(a, (x, i) ->
          |  aggregate(slice(transform(a, z -> z.v_e6 - mu_e6), 1, i + 1),
          |    0L, (acc, y) -> greatest(0L, acc + y)))""".stripMargin))
      .withColumn("h_e6",
        (lit(hMult.toLong) *
          (array_max(col("_vs")) - array_min(col("_vs")))).cast("long"))
      .withColumn("first_alarm", expr(
        """element_at(filter(
          |  transform(a, (x, i) -> named_struct(
          |    'd', x.d, 's', element_at(_s, i + 1))),
          |  p -> p.s > h_e6), 1).d""".stripMargin))
      .select(col(keyCol), col("n_days"), col("mu_e6"),
        array_max(col("_s")).as("max_cusum_e6"),
        expr("CAST(size(filter(_s, s -> s > h_e6)) AS BIGINT)").as("n_alarms"),
        col("h_e6"), col("first_alarm"))
  }

  /** The fixed-width chunk id the long-history folds loop over:
    * floor(days-since-epoch / chunkDays). Fixed windows, not calendar
    * years, so the chunk length is a tunable independent of where the
    * history starts (and the correctness gate can fold MANY chunks even
    * over a one-month fixture).
    */
  private def chunkId(chunkDays: Int) =
    floor(datediff(col("d"), lit(java.sql.Date.valueOf("1970-01-01")))
      / chunkDays).cast("int")

  /** [[ewmaDaily]] with the per-key prefix folds CHUNKED into fixed
    * `chunkDays` windows, the chunks folded SEQUENTIALLY through
    * [[ewmaDailySeeded]]'s `_s_off` carry — the long-history form. The
    * in-row folds are O(len²) integer ops per key per chunk; unchunked, a
    * 10-year key pays ~6.7M ops where 365-day chunks pay 10 × 365²/2 ≈
    * 0.67M — O(d · chunkDays) total, LINEAR in history length with a
    * bounded constant. Correct by the seeded-carry identity (the e15
    * gate): the carry entering chunk C is exactly the recurrence's state
    * after chunk C−1, so the union of chunk outputs IS the full-history
    * series — ts6's oracle runs the UNCHUNKED recurrence over the same
    * data. The chunk-id loop is driver-side but bounded by
    * history/chunkDays (≈ one iteration per year at the default), never
    * data-scale; each chunk's state hand-off is localCheckpoint'd, so
    * plan depth stays O(1) per chunk.
    */
  def ewmaDailyChunked(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String, alphaNum: Int = 3, alphaDen: Int = 10,
      chunkDays: Int = 365): DataFrame =
    ewmaChunkedFromDaily(dailyE6(df, keyCol, tsCol, valCol), keyCol,
      alphaNum, alphaDen, chunkDays)

  /** [[ewmaDailyChunked]] over a PRECOMPUTED [[dailyE6]] frame — the reuse
    * seam for the auto router, whose span probe already aggregated the
    * daily grain (one corpus pass, not one per consumer).
    */
  private[ops] def ewmaChunkedFromDaily(daily0: DataFrame, keyCol: String,
      alphaNum: Int, alphaDen: Int, chunkDays: Int): DataFrame = {
    require(chunkDays >= 2, "ewmaDailyChunked needs chunkDays >= 2")
    // Repartitioned BY KEY before the persist: every per-chunk groupBy
    // below then reuses the cached HashPartitioning (guide §2.4 — two
    // operations keyed the same way share one exchange) instead of paying
    // one Exchange per chunk over the loop.
    val daily = daily0.withColumn("_ck", chunkId(chunkDays))
      .repartition(col(keyCol))
      .persistTracked()
    val chunks = daily.select("_ck").distinct()
      .collect().map(_.getInt(0)).sorted
    var state: DataFrame = null
    var out: DataFrame = null
    for (c <- chunks) {
      val part = daily.filter(col("_ck") === c).drop("_ck")
      // One grouped frame per chunk feeds BOTH the chunk output and the
      // carried state. Only the STATE is materialized per chunk (one
      // bounded #keys-row frame — the sequential carry that must not
      // re-derive its whole prefix), via the O(len) whole-chunk fold; the
      // chunk OUTPUTS stay lazy plans over the cached daily + the
      // checkpointed state: materializing them per chunk would persist
      // the full corpus-sized result once per chunk — fixture noise here,
      // a blockmanager flood at 100 TB.
      val arr = ewmaArr(part,
        if (state != null) state else freshState(part, keyCol), keyCol)
      val latest = ewmaChunkState(arr, keyCol, alphaNum, alphaDen)
      // Keys untouched this chunk keep their prior state.
      state =
        (if (state == null) latest
         else latest.unionByName(
           state.join(latest, Seq(keyCol), "left_anti")))
          .localCheckpoint()
      val pub = ewmaSeededFromArr(arr, keyCol, alphaNum, alphaDen)
        .drop("_ewma_off")
      out = if (out == null) pub else out.unionByName(pub)
    }
    if (out != null) out
    else ewmaDailySeeded(daily.drop("_ck"), freshState(daily, keyCol),
      keyCol, alphaNum, alphaDen).drop("_ewma_off") // empty input: schema only
  }

  /** ts9: AUTO-ROUTED long-history EWMA — the caller stops choosing
    * between [[ewmaDaily]] (O(d²) per key, cheapest on short histories
    * where chunking's per-chunk state-carry jobs dominate) and
    * [[ewmaDailyChunked]] (O(d·chunkDays), the only viable form on
    * multi-year keys). The rule comes from the measured crossover
    * (PERF.md: chunked reads 0.7× of unchunked at 365-day keys and 3.3×
    * at 3,650-day keys → the break sits near history ≈ 2 × chunkDays):
    * route CHUNKED iff the LONGEST per-key history span exceeds
    * chunkDays × spanMult. The gate is DECLARATIVE in the fitAuto/v24
    * sense — one bounded aggregate (max per-key span, a single row — the
    * same driver-side control read every chunked fold already does for
    * its chunk list) decides the plan shape, and the CHOICE rides along
    * (`mode`, `max_span`) so the oracle replicates and hashes the
    * routing itself, not just the series (the c5 chosen-rung
    * discipline). Both regimes produce the identical recurrence output
    * by the e15 seeded-carry identity, so the routing can never change a
    * value — only the plan.
    */
  def ewmaDailyAuto(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String, alphaNum: Int = 3, alphaDen: Int = 10,
      chunkDays: Int = 365, spanMult: Int = 2): DataFrame =
    ewmaDailyAutoFromDaily(
      dailyE6(df, keyCol, tsCol, valCol).persistTracked(),
      keyCol, alphaNum, alphaDen, chunkDays, spanMult)

  /** [[ewmaDailyAuto]] over a PRECOMPUTED (caller-persisted) [[dailyE6]]
    * frame: the span probe, the chunk loop, and the seeded recurrence all
    * read ONE daily aggregate instead of each re-scanning and re-grouping
    * the raw events (guide §1.2 — don't compute the same pass per
    * consumer). A witness that runs the router at several operating
    * points (ts9/ts10) shares one daily frame across all of them.
    */
  def ewmaDailyAutoFromDaily(daily: DataFrame, keyCol: String,
      alphaNum: Int = 3, alphaDen: Int = 10,
      chunkDays: Int = 365, spanMult: Int = 2): DataFrame = {
    val maxSpan = maxSpanOf(daily, keyCol)
    val chunked = maxSpan > chunkDays.toLong * spanMult
    val series =
      if (chunked) ewmaChunkedFromDaily(daily, keyCol, alphaNum, alphaDen,
        chunkDays)
      else ewmaDailySeeded(daily, freshState(daily, keyCol), keyCol,
        alphaNum, alphaDen).drop("_ewma_off")
    series
      .withColumn("mode", lit(if (chunked) "chunked" else "unchunked"))
      .withColumn("max_span", lit(maxSpan))
  }

  /** The routers' span gate: the longest per-key history span (days),
    * one bounded aggregate over the daily frame.
    */
  private def maxSpanOf(daily: DataFrame, keyCol: String): Long =
    daily.groupBy(col(keyCol))
      .agg((datediff(max(col("d")), min(col("d"))) + 1).as("_span"))
      .agg(coalesce(max(col("_span")), lit(0)).cast("long"))
      .head().getLong(0)

  /** ts10: [[ewmaDailyAuto]]'s routing rule applied to the CUSUM pair
    * (ts5 unchunked / ts7 chunked) — the same declarative span gate, the
    * same ride-along `mode`/`max_span` columns, the same both-regimes-
    * identical guarantee (the chunked fold's five-field carry reproduces
    * the unchunked recurrence exactly, ts7's gate). One rule now routes
    * BOTH long-history fold families; a caller never chooses a fold
    * shape by hand.
    */
  def cusumDailyAuto(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String, hMult: Int = 1, chunkDays: Int = 365,
      spanMult: Int = 2): DataFrame =
    cusumDailyAutoFromDaily(
      dailyE6(df, keyCol, tsCol, valCol).persistTracked(),
      keyCol, hMult, chunkDays, spanMult)

  /** [[cusumDailyAuto]] over a PRECOMPUTED (caller-persisted) [[dailyE6]]
    * frame — same reuse seam as [[ewmaDailyAutoFromDaily]]: one daily
    * aggregate feeds the span probe and whichever fold the gate routes
    * to.
    */
  def cusumDailyAutoFromDaily(daily: DataFrame, keyCol: String,
      hMult: Int = 1, chunkDays: Int = 365, spanMult: Int = 2): DataFrame = {
    val maxSpan = maxSpanOf(daily, keyCol)
    val chunked = maxSpan > chunkDays.toLong * spanMult
    val series =
      if (chunked) cusumChunkedFromDaily(daily, keyCol, hMult, chunkDays)
      else cusumFromDaily(daily, keyCol, hMult)
    series
      .withColumn("mode", lit(if (chunked) "chunked" else "unchunked"))
      .withColumn("max_span", lit(maxSpan))
  }

  /** [[cusumDaily]] in the same chunked form — the recurrence's per-key
    * constants (μ over the FULL history, the self-scaling threshold h,
    * the day count) are ONE keyed aggregate up front, then the S⁺ folds
    * run per fixed `chunkDays` window with a five-field carry between
    * chunks: the running statistic, its peak, the alarm-day count, the
    * first alarm date, handed off exactly like [[ewmaDailyChunked]]'s
    * `_s_off`. Same O(d · chunkDays) bound; ts7's oracle runs the
    * unchunked recurrence, so one lost or double-counted hand-off flips
    * the summary row.
    */
  def cusumDailyChunked(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String, hMult: Int = 1, chunkDays: Int = 365): DataFrame =
    cusumChunkedFromDaily(dailyE6(df, keyCol, tsCol, valCol), keyCol,
      hMult, chunkDays)

  /** [[cusumDailyChunked]] over a PRECOMPUTED [[dailyE6]] frame (the auto
    * router's reuse seam). Repartitioned BY KEY before the persist so the
    * per-chunk groupBys and the global-constants aggregate all reuse one
    * cached HashPartitioning instead of paying an Exchange per chunk
    * (guide §2.4).
    */
  private[ops] def cusumChunkedFromDaily(daily0: DataFrame, keyCol: String,
      hMult: Int, chunkDays: Int): DataFrame = {
    require(hMult >= 1, "cusumDailyChunked needs hMult >= 1")
    require(chunkDays >= 2, "cusumDailyChunked needs chunkDays >= 2")
    val daily = daily0
      .withColumn("_ck", chunkId(chunkDays))
      .repartition(col(keyCol))
      .persistTracked()
    val glob = daily.groupBy(col(keyCol))
      .agg(expr("sum(v_e6) div count(1)").as("mu_e6"),
        (lit(hMult.toLong) * (max(col("v_e6")) - min(col("v_e6"))))
          .cast("long").as("h_e6"),
        count(lit(1)).as("n_days"))
      .persistTracked()
    val chunks = daily.select("_ck").distinct()
      .collect().map(_.getInt(0)).sorted
    // Carry: (_s running statistic, _mx peak, _al alarm days, _fa first
    // alarm). S⁺ is ≥ 0 by construction, so 0 seeds both _s and _mx.
    var state: DataFrame = null
    for (c <- chunks) {
      val part = daily.filter(col("_ck") === c)
        .groupBy(col(keyCol))
        .agg(sort_array(collect_list(struct(col("d"), col("v_e6")))).as("a"))
        .join(glob.select(col(keyCol), col("mu_e6"), col("h_e6")),
          Seq(keyCol))
      val seeded =
        if (state == null)
          part.withColumn("_s", lit(0L)).withColumn("_mx", lit(0L))
            .withColumn("_al", lit(0L))
            .withColumn("_fa", lit(null).cast("date"))
        else part.join(state, Seq(keyCol), "left")
      state = seeded
        .withColumn("_sc", expr(
          """transform(a, (x, i) ->
            |  aggregate(slice(transform(a, z -> z.v_e6 - mu_e6), 1, i + 1),
            |    coalesce(_s, 0L), (acc, y) -> greatest(0L, acc + y)))"""
            .stripMargin))
        .select(col(keyCol),
          expr("element_at(_sc, size(_sc))").as("_s"),
          greatest(coalesce(col("_mx"), lit(0L)), array_max(col("_sc")))
            .as("_mx"),
          (coalesce(col("_al"), lit(0L)) +
            expr("CAST(size(filter(_sc, s -> s > h_e6)) AS BIGINT)"))
            .as("_al"),
          coalesce(col("_fa"), expr(
            """element_at(filter(
              |  transform(a, (x, i) -> named_struct(
              |    'd', x.d, 's', element_at(_sc, i + 1))),
              |  p -> p.s > h_e6), 1).d""".stripMargin)).as("_fa"))
        .unionByName(
          if (state == null) daily.limit(0).select(col(keyCol),
            lit(0L).as("_s"), lit(0L).as("_mx"), lit(0L).as("_al"),
            lit(null).cast("date").as("_fa"))
          else state.join(part.select(keyCol), Seq(keyCol), "left_anti"))
        .localCheckpoint()
    }
    val st =
      if (state != null) state
      else glob.limit(0).select(col(keyCol), lit(0L).as("_s"),
        lit(0L).as("_mx"), lit(0L).as("_al"),
        lit(null).cast("date").as("_fa"))
    st.join(glob, Seq(keyCol))
      .select(col(keyCol), col("n_days"), col("mu_e6"),
        col("_mx").as("max_cusum_e6"), col("_al").as("n_alarms"),
        col("h_e6"), col("_fa").as("first_alarm"))
  }
}
