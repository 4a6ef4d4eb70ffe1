package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TimeSeries

class TimeSeriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def series(rows: (Long, String, Double)*) =
    rows.toDF("user_id", "ts", "value")
      .withColumn("ts", to_timestamp(col("ts")))

  test("gapFillDaily interpolates interior gaps linearly") {
    // user 1: day 1 = 10, day 4 = 40 -> days 2,3 interpolate to 20, 30
    val df = series(
      (1L, "2024-01-01 12:00:00", 10.0),
      (1L, "2024-01-04 09:00:00", 40.0))
    val out = TimeSeries.gapFillDaily(df, "user_id", "ts", "value")
      .orderBy("d").collect()
    assert(out.length == 4)
    assert(out.map(_.getDouble(2)).toSeq == Seq(10.0, 20.0, 30.0, 40.0))
    assert(out.map(_.getBoolean(3)).toSeq == Seq(false, true, true, false))
  }

  test("gapFillDaily averages same-day observations before filling") {
    val df = series(
      (2L, "2024-02-01 00:00:00", 4.0),
      (2L, "2024-02-01 23:00:00", 6.0), // day mean 5
      (2L, "2024-02-03 00:00:00", 11.0))
    val out = TimeSeries.gapFillDaily(df, "user_id", "ts", "value")
      .orderBy("d").collect()
    assert(out.map(_.getDouble(2)).toSeq == Seq(5.0, 8.0, 11.0))
  }

  test("rollingDailyStats uses a calendar-day frame, not a row frame") {
    // days 1,2,10: day 10's 7-day window must NOT include days 1-2
    val df = series(
      (1L, "2024-01-01 00:00:00", 10.0),
      (1L, "2024-01-02 00:00:00", 20.0),
      (1L, "2024-01-10 00:00:00", 99.0))
    val out = TimeSeries.rollingDailyStats(df, "user_id", "ts", "value")
      .orderBy("d").collect()
    assert(out.map(_.getLong(3)).toSeq == Seq(1, 2, 1)) // n_win
    assert(out(1).getDouble(4) == 15.0) // avg(10,20)
    assert(out(2).getDouble(4) == 99.0) // gap reset: only day 10 in frame
    // anomaly suppressed below 3 observations
    assert(out.forall(!_.getBoolean(6)))
  }

  test("rollingDailyStats flags a 2-sigma spike once the window has data") {
    val df = series((Seq.tabulate(6)(i =>
      (2L, f"2024-02-0${i + 1}%d 00:00:00", 10.0)) :+
      ((2L, "2024-02-07 00:00:00", 500.0))): _*)
    val out = TimeSeries.rollingDailyStats(df, "user_id", "ts", "value")
      .orderBy("d").collect()
    assert(out.count(_.getBoolean(6)) == 1 && out.last.getBoolean(6))
  }

  test("gapFillDaily keys are independent and spines never cross users") {
    val df = series(
      (1L, "2024-01-01 00:00:00", 1.0),
      (1L, "2024-01-03 00:00:00", 3.0),
      (3L, "2024-03-10 00:00:00", 7.0)) // single-day series: no fill rows
    val out = TimeSeries.gapFillDaily(df, "user_id", "ts", "value")
    assert(out.count() == 4)
    val u3 = out.filter(col("user_id") === 3).collect()
    assert(u3.length == 1 && u3.head.getDouble(2) == 7.0)
  }

  test("ewmaDaily runs the exact integer recurrence in date order") {
    val df = series(
      (1L, "2024-01-01 10:00:00", 100.0),
      (1L, "2024-01-02 10:00:00", 200.0),
      (1L, "2024-01-03 10:00:00", 50.0),
      (2L, "2024-01-01 10:00:00", 7.0))
    val got = TimeSeries.ewmaDaily(df, "user_id", "ts", "value")
      .select("user_id", "d", "v_e6", "ewma_e6")
      .as[(Long, java.sql.Date, Long, Long)].collect()
      .map(r => (r._1, r._2.toString, r._3, r._4)).sortBy(x => (x._1, x._2))
    // hand recurrence on e6 values: s1=1e8; s2=(3*2e8+7*1e8)/10=1.3e8;
    // s3=(3*5e7+7*1.3e8)/10=1.06e8; user 2 single point = itself
    assert(got.toSeq == Seq(
      (1L, "2024-01-01", 100000000L, 100000000L),
      (1L, "2024-01-02", 200000000L, 130000000L),
      (1L, "2024-01-03", 50000000L, 106000000L),
      (2L, "2024-01-01", 7000000L, 7000000L)))
  }

  test("ewmaDaily offset keeps floor semantics exact on negative values") {
    // -0.35 then 0.05: s2 = floor((3*50000 + 7*(-350000))/10) with FLOOR
    // (not truncation): (150000 - 2450000)/10 = -230000 exactly here;
    // pick values forcing a non-exact division: -0.333333 then 0.0
    val df = series(
      (1L, "2024-01-01 10:00:00", -0.333333),
      (1L, "2024-01-02 10:00:00", 0.0))
    val got = TimeSeries.ewmaDaily(df, "user_id", "ts", "value")
      .select("ewma_e6").as[Long].collect().sorted
    // s1 = -333333; s2 = floor(7*(-333333)/10) = floor(-233333.1) = -233334
    assert(got.toSeq == Seq(-333333L, -233334L))
  }

  test("cusumDaily ramps on a mean shift and stays quiet on a flat series") {
    // u1: 5 days at 10 then 5 days at 30 — mean 20, devs −10e6 ×5 then
    // +10e6 ×5; S+ stays 0 through the low half, then ramps 10,20,…,50e6.
    // Range h = 20e6 (strict >): day 7 hits exactly 20e6 and does NOT
    // alarm; days 8–10 (30,40,50e6) do — first alarm 2024-01-08.
    // u2: constant series — S+ ≡ 0, h = 0, zero alarms, null first date.
    val rows =
      (1 to 10).map(d => (1L, f"2024-01-$d%02d 10:00:00",
        if (d <= 5) 10.0 else 30.0)) ++
        (1 to 4).map(d => (2L, f"2024-01-$d%02d 10:00:00", 7.0))
    val got = TimeSeries.cusumDaily(series(rows: _*),
        "user_id", "ts", "value")
      .as[(Long, Long, Long, Long, Long, Long, Option[java.sql.Date])]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 10L, 20000000L, 50000000L, 3L, 20000000L,
      Some(java.sql.Date.valueOf("2024-01-08")))))
    assert(got(2L) == ((2L, 4L, 7000000L, 0L, 0L, 0L, None)))
  }

  test("cusumDaily is partitioning-invariant") {
    val rows = (1 to 12).map(d =>
      ((d % 3).toLong, f"2024-01-$d%02d 03:00:00", (d * 13 % 7).toDouble))
    val df = series(rows: _*)
    val a = TimeSeries.cusumDaily(df, "user_id", "ts", "value")
      .collect().map(_.toString).sorted.toSeq
    val b = TimeSeries.cusumDaily(df.repartition(7), "user_id", "ts", "value")
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("ewmaDailySeeded hand-off equals the full-history recurrence") {
    val df = series(
      (1L, "2024-01-01 10:00:00", 10.0), (1L, "2024-01-02 10:00:00", 90.0),
      (1L, "2024-01-03 10:00:00", 5.0), (1L, "2024-01-04 10:00:00", 70.0),
      (1L, "2024-01-05 10:00:00", 1.0),
      (2L, "2024-01-04 10:00:00", 3.0), // key arriving only in phase 2
      (3L, "2024-01-01 10:00:00", 8.0)) // key present only in phase 1
    val full = TimeSeries.ewmaDaily(df, "user_id", "ts", "value")
      .as[(Long, java.sql.Date, Long, Long)].collect().toSet
    val cut = to_date(lit("2024-01-03"))
    val p1 = TimeSeries.ewmaDailySeeded(
      TimeSeries.dailyE6(df.filter(to_date(col("ts")) <= cut),
        "user_id", "ts", "value"),
      df.select(col("user_id"), lit(null).cast("long").as("_s_off")).limit(0),
      "user_id")
    val st = p1.groupBy("user_id")
      .agg(max(struct(col("d"), col("_ewma_off"))).as("m"))
      .select(col("user_id"), col("m._ewma_off").as("_s_off"))
    val p2 = TimeSeries.ewmaDailySeeded(
      TimeSeries.dailyE6(df.filter(to_date(col("ts")) > cut),
        "user_id", "ts", "value"), st, "user_id")
    val got = p1.drop("_ewma_off").unionByName(p2.drop("_ewma_off"))
      .as[(Long, java.sql.Date, Long, Long)].collect().toSet
    assert(got == full)
  }

  // Deterministic multi-year per-key history: ~1 observation/day over
  // `nDays` days from 2020-01-01, values wobbling enough that the EWMA
  // and CUSUM statistics move every day. Key 2 appears only in the last
  // 100 days (exercises carry-absent keys entering mid-history).
  private def longSeries(nDays: Int) = {
    val d0 = java.time.LocalDate.parse("2020-01-01")
    val rows = (0 until nDays).flatMap { i =>
      val day = d0.plusDays(i.toLong).toString
      val base = Seq((1L, s"$day 09:00:00", ((i * 37) % 100 + 1).toDouble))
      if (i >= nDays - 100) base :+
        (2L, s"$day 15:00:00", ((i * 13) % 50 + 2).toDouble)
      else base
    }
    series(rows: _*)
  }

  test("ewmaDailyChunked over 3 years equals the unchunked recurrence") {
    val df = longSeries(1100) // spans 4 calendar years, 4 default chunks
    val full = TimeSeries.ewmaDaily(df, "user_id", "ts", "value")
      .as[(Long, java.sql.Date, Long, Long)].collect().toSet
    val chunked = TimeSeries.ewmaDailyChunked(df, "user_id", "ts", "value")
      .as[(Long, java.sql.Date, Long, Long)].collect().toSet
    assert(chunked == full)
    // Small chunks stress the carry 10x harder — still identical.
    val tiny = TimeSeries.ewmaDailyChunked(df, "user_id", "ts", "value",
        chunkDays = 90)
      .as[(Long, java.sql.Date, Long, Long)].collect().toSet
    assert(tiny == full)
  }

  test("ewmaDailyChunked over a 3650-day key equals the unchunked form") {
    // The VERDICT r13 done-criterion: a DECADE-long key, year chunks.
    // 10 carry hand-offs; the unchunked side pays the full O(d^2) fold,
    // so this is also the parity case closest to the crossover regime
    // the chunking exists for.
    val df = longSeries(3650)
    val full = TimeSeries.ewmaDaily(df, "user_id", "ts", "value")
      .as[(Long, java.sql.Date, Long, Long)].collect().toSet
    val chunked = TimeSeries.ewmaDailyChunked(df, "user_id", "ts", "value",
        chunkDays = 365)
      .as[(Long, java.sql.Date, Long, Long)].collect().toSet
    assert(chunked == full)
  }

  test("ewmaDailyAuto routes by the span rule and never changes a value") {
    // One case on EACH side of the crossover gate (chunked iff max
    // per-key span > chunkDays × 2). Short history, chunkDays=365:
    // 120 < 730 → unchunked. Same history, chunkDays=30: 120 > 60 →
    // chunked. Either way the series must equal the plain recurrence —
    // routing is a plan choice, never a value change.
    val df = longSeries(120)
    val full = TimeSeries.ewmaDaily(df, "user_id", "ts", "value")
      .as[(Long, java.sql.Date, Long, Long)].collect().toSet
    val un = TimeSeries.ewmaDailyAuto(df, "user_id", "ts", "value",
      chunkDays = 365)
    assert(un.select("mode").distinct().as[String].collect().toSeq ==
      Seq("unchunked"))
    assert(un.select("max_span").head().getLong(0) == 120L)
    val ch = TimeSeries.ewmaDailyAuto(df, "user_id", "ts", "value",
      chunkDays = 30)
    assert(ch.select("mode").distinct().as[String].collect().toSeq ==
      Seq("chunked"))
    for (r <- Seq(un, ch)) {
      assert(r.select("user_id", "d", "v_e6", "ewma_e6")
        .as[(Long, java.sql.Date, Long, Long)].collect().toSet == full)
    }
    // Boundary pin: span exactly chunkDays × 2 stays UNCHUNKED (strict >).
    val edge = TimeSeries.ewmaDailyAuto(df, "user_id", "ts", "value",
      chunkDays = 60)
    assert(edge.select("mode").distinct().as[String].collect().toSeq ==
      Seq("unchunked"))
  }

  test("cusumDailyAuto routes by the same span rule, values unchanged") {
    // ts9's gate on the CUSUM family: each side of the crossover routes
    // correctly and both regimes emit ts5's exact summary rows.
    val df = longSeries(120)
    val full = TimeSeries.cusumDaily(df, "user_id", "ts", "value")
      .as[(Long, Long, Long, Long, Long, Long, Option[java.sql.Date])]
      .collect().toSet
    val un = TimeSeries.cusumDailyAuto(df, "user_id", "ts", "value",
      chunkDays = 365)
    assert(un.select("mode").distinct().as[String].collect().toSeq ==
      Seq("unchunked"))
    val ch = TimeSeries.cusumDailyAuto(df, "user_id", "ts", "value",
      chunkDays = 30)
    assert(ch.select("mode").distinct().as[String].collect().toSeq ==
      Seq("chunked"))
    for (r <- Seq(un, ch)) {
      assert(r.drop("mode", "max_span")
        .as[(Long, Long, Long, Long, Long, Long, Option[java.sql.Date])]
        .collect().toSet == full)
    }
  }

  test("cusumDailyChunked over 3 years equals the unchunked recurrence") {
    val df = longSeries(1100)
    val full = TimeSeries.cusumDaily(df, "user_id", "ts", "value")
      .as[(Long, Long, Long, Long, Long, Long, Option[java.sql.Date])]
      .collect().toSet
    val chunked = TimeSeries.cusumDailyChunked(df, "user_id", "ts", "value")
      .as[(Long, Long, Long, Long, Long, Long, Option[java.sql.Date])]
      .collect().toSet
    assert(chunked == full)
    val tiny = TimeSeries.cusumDailyChunked(df, "user_id", "ts", "value",
        chunkDays = 90)
      .as[(Long, Long, Long, Long, Long, Long, Option[java.sql.Date])]
      .collect().toSet
    assert(tiny == full)
  }

  test("cusumDailyChunked carries peak/alarms/first-alarm across chunks") {
    // Mean shift in year 2: the alarm FIRES mid-history, so first_alarm
    // and the peak live in different chunks than the final statistic —
    // a carry that only hands off S⁺ (not the summary fields) would
    // report a later first alarm or a truncated peak.
    val d0 = java.time.LocalDate.parse("2020-01-01")
    val rows = (0 until 500).map { i =>
      val day = d0.plusDays(i.toLong).toString
      (9L, s"$day 09:00:00", if (i < 250) 10.0 else 30.0)
    }
    val df = series(rows: _*)
    val full = TimeSeries.cusumDaily(df, "user_id", "ts", "value")
      .as[(Long, Long, Long, Long, Long, Long, Option[java.sql.Date])]
      .collect().toSet
    val chunked = TimeSeries.cusumDailyChunked(df, "user_id", "ts", "value",
        chunkDays = 60)
      .as[(Long, Long, Long, Long, Long, Long, Option[java.sql.Date])]
      .collect().toSet
    assert(chunked == full)
    assert(full.head._5 > 0, "shift must actually alarm")
  }
}
