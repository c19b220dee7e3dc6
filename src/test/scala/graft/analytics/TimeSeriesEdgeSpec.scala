package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Date

/** FIXTURES.md §A edge cases for the time-series analytics: ≥60
  * consecutive days (chart cap / forecast window), a gap day, a
  * below-minimum symbol, a zero-return day. */
class TimeSeriesEdgeSpec extends SparkSpec {
  import spark.implicits._

  // 70 consecutive days for LONG (with day 35 missing = gap), flat
  // day 10 (zero return); SHORT has only 3 bars (below forecast min)
  private lazy val bars = {
    val long = (1 to 71).filter(_ != 35).map { i =>
      val close = if (i == 10 || i == 9) 100.0 else 100.0 + i * 0.5
      ("LONG", Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i - 1)), close)
    }
    val short = (1 to 3).map(i =>
      ("SHORT", Date.valueOf(java.time.LocalDate.of(2024, 1, i)), 50.0 + i))
    (long ++ short).toDF("symbol", "timestamp", "close")
  }

  test("returns: zero-return day yields 0.0, gap day just chains (LAG semantics)") {
    val r = TimeSeries.returns(bars, "symbol", "timestamp", "close")
      .filter($"symbol" === "LONG")
    // day 10 has same close as day 9 → ret == 0.0 exactly
    assert(r.filter($"timestamp" === "2024-01-10").select("ret").as[Double].head() == 0.0)
    // first row's ret is null
    assert(r.filter($"timestamp" === "2024-01-01").select("ret").head().isNullAt(0))
    // gap: Feb 4 (i=35) missing; Feb 5 lags to Feb 3 — non-null
    assert(r.filter($"timestamp" === "2024-02-05").select("ret").head().isNullAt(0) == false)
    // row count = bars - 1 non-null returns... (first is null)
    assert(r.filter($"ret".isNotNull).count() == 69)
  }

  test("forecast: trains on exactly last 50, refuses the 3-bar symbol") {
    val f = TimeSeries.forecast(bars, "symbol", "timestamp", "close",
      trainN = 50, horizon = 30, minRows = 5)
    val syms = f.select("symbol").distinct().as[String].collect().toSet
    assert(syms == Set("LONG")) // SHORT filtered by minRows
    assert(f.count() == 30)
    assert(f.select("n").distinct().as[Long].head() == 50L) // window honored
    assert(f.select("trend").distinct().as[String].head() == "UP")
    // predictions extend from the last real date
    val firstPred = f.orderBy("step").select("pred_date").as[Date].head()
    assert(firstPred == Date.valueOf("2024-03-12")) // last bar + 1 day
  }

  test("chart tail-60 then re-sort ascending (O5/O6)") {
    val tail = bars.filter($"symbol" === "LONG")
      .orderBy($"timestamp".desc).limit(60).orderBy("timestamp")
    assert(tail.count() == 60)
    val days = tail.select("timestamp").as[Date].collect()
    assert(days.head.before(days.last))
    // the 60 most recent: earliest kept day is day 11 of the series
    assert(days.head == Date.valueOf("2024-01-11"))
  }

  test("ohlcBars: open/close pick first/last by time, high/low the extremes") {
    val prices = Seq(
      ("A", Date.valueOf("2024-01-05"), 10.0),
      ("A", Date.valueOf("2024-01-20"), 30.0),
      ("A", Date.valueOf("2024-01-31"), 20.0),
      ("A", Date.valueOf("2024-02-01"), 50.0),
      ("B", Date.valueOf("2024-01-10"), 7.0))
      .toDF("symbol", "timestamp", "close")
    val got = TimeSeries.ohlcBars(prices, "symbol", "timestamp", "close")
      .select($"symbol", $"bar", $"open", $"high", $"low", $"close", $"n")
      .as[(String, Date, Double, Double, Double, Double, Long)]
      .collect().sortBy(r => (r._1, r._2.toString)).toSeq
    assert(got == Seq(
      ("A", Date.valueOf("2024-01-01"), 10.0, 30.0, 10.0, 20.0, 3L),
      ("A", Date.valueOf("2024-02-01"), 50.0, 50.0, 50.0, 50.0, 1L),
      ("B", Date.valueOf("2024-01-01"), 7.0, 7.0, 7.0, 7.0, 1L)))
  }

  test("rollingIndicators: hand-checked SMA/RSI on a 5-bar series") {
    val prices = Seq(10.0, 12.0, 11.0, 14.0, 14.0).zipWithIndex.map {
      case (c, i) => ("A", Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)), c)
    }.toDF("symbol", "timestamp", "close")
    val got = TimeSeries.rollingIndicators(prices, "symbol", "timestamp", "close",
        smaN = 3, rsiN = 3)
      .orderBy("timestamp")
      .select($"close", $"sma", $"vol", $"rsi", $"n_win")
      .collect()
    // day 1: frame = {10}; no prior close → gain=loss=0 → RSI NULL (0/0)
    assert(got(0).getDouble(1) == 10.0 && got(0).isNullAt(2) &&
      got(0).isNullAt(3) && got(0).getLong(4) == 1L)
    // day 2: gains only so far → RSI 100
    assert(got(1).getDouble(3) == 100.0)
    // day 3: sma of {10,12,11} = 11; ag=2/3, al=1/3 → RSI 66.67
    assert(got(2).getDouble(1) == 11.0)
    assert(math.abs(got(2).getDouble(3) - 100.0 * 2 / 3) < 1e-9)
    // day 5: frame {d3,d4,d5}: ag=1, al=1/3 → RSI 75; sma {11,14,14}=13
    assert(got(4).getDouble(1) == 13.0)
    assert(math.abs(got(4).getDouble(3) - 75.0) < 1e-9)
    // the frame is row-bounded: n_win caps at smaN
    assert(got.map(_.getLong(4)).toSeq == Seq(1L, 2L, 3L, 3L, 3L))
  }

  test("drawdown: running peak + dd; maxDrawdown summary") {
    val prices = Seq(10.0, 16.0, 12.0, 8.0, 20.0).zipWithIndex.map {
      case (c, i) => ("A", Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)), c)
    }.toDF("symbol", "timestamp", "close")
    val dd = TimeSeries.drawdown(prices, "symbol", "timestamp", "close")
      .orderBy("timestamp").select($"peak", $"dd")
      .as[(Double, Double)].collect().toSeq
    assert(dd == Seq((10.0, 0.0), (16.0, 0.0), (16.0, -0.25),
      (16.0, -0.5), (20.0, 0.0)))
    val md = TimeSeries.maxDrawdown(prices, "symbol", "timestamp", "close")
      .select($"max_drawdown", $"peak_close", $"n_bars")
      .as[(Double, Double, Long)].head()
    assert(md == ((-0.5, 20.0, 5L)))
  }

  test("CoV/beta survive a symbol with constant prices (corr NULL case)") {
    val flat = (1 to 20).map(i =>
      ("FLAT", Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i - 1)), 10.0))
    val both = bars.union(flat.toDF("symbol", "timestamp", "close"))
    val rets = TimeSeries.returns(both, "symbol", "timestamp", "close")
    val cov = TimeSeries.coefficientOfVariation(rets, "symbol")
    // FLAT: all returns 0 → stddev 0, avg 0 → NULL (0/0), not a crash
    val flatCov = cov.filter($"symbol" === "FLAT").select("cov").head()
    assert(flatCov.isNullAt(0))
    val corr = TimeSeries.corrMatrix(rets, "symbol", "timestamp")
    val cFlat = corr.filter($"k1" === "FLAT" && $"k2" === "FLAT")
      .select("correlation").head()
    assert(cFlat.isNullAt(0)) // corr of constant series is NULL (PG parity)
  }

  test("ema: recurrence matches a hand-rolled sequential fold per key") {
    val df = bars // LONG (70 bars) + SHORT (3 bars)
    val out = TimeSeries.ema(df, "symbol", "timestamp", "close", alpha = 0.25)
      .select($"symbol", $"timestamp", $"close", $"ema")
      .orderBy("symbol", "timestamp")
      .as[(String, Date, Double, Double)].collect()
    val expected = out.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      var e = 0.0; var first = true
      rows.sortBy(_._2.getTime).toSeq.map { r =>
        e = if (first) r._3 else 0.25 * r._3 + 0.75 * e
        first = false
        (r._1, r._2, e)
      }
    }.toSet
    assert(out.map(r => (r._1, r._2, r._4)).toSet == expected)
    // first row per key seeds with its own value, exactly
    assert(out.find(r => r._1 == "SHORT").get._4 == 51.0)
  }

  test("ema: NULL values emit NULL before the seed, carry state after") {
    val df = Seq(
      ("K", 1, Option.empty[Double]), ("K", 2, Some(10.0)),
      ("K", 3, Option.empty[Double]), ("K", 4, Some(20.0)))
      .toDF("k", "i", "x")
    val rows = TimeSeries.ema(df, "k", "i", "x", alpha = 0.5)
      .orderBy("i").select("ema").collect()
    assert(rows(0).isNullAt(0))           // null before any seed
    assert(rows(1).getDouble(0) == 10.0)  // seed
    assert(rows(2).getDouble(0) == 10.0)  // null row carries state
    assert(rows(3).getDouble(0) == 15.0)  // 0.5*20 + 0.5*10
  }

  test("ema/holt: BINARY-typed keys carry state across rows (deep key equality)") {
    // a BinaryType key surfaces to the scan as Array[Byte], whose ==
    // is reference equality — a plain != key comparison would reset
    // the state on EVERY row and the series would degenerate to
    // ema == close; two interleaved byte keys pin the reset points
    val df = Seq(
      (Array[Byte](1, 2), 1, 10.0), (Array[Byte](1, 2), 2, 20.0),
      (Array[Byte](1, 2), 3, 30.0),
      (Array[Byte](9), 1, 100.0), (Array[Byte](9), 2, 200.0))
      .toDF("k", "i", "x")
    val ema = TimeSeries.ema(df, "k", "i", "x", alpha = 0.5)
      .select(hex($"k").as("k"), $"i", $"ema")
      .as[(String, Int, Double)].collect().sortBy(r => (r._1, r._2))
    assert(ema.map(_._3).toSeq == Seq(
      10.0, 15.0, 22.5,   // key 0102: seeds then smooths
      100.0, 150.0),      // key 09: fresh seed at the key change
      ema.mkString(", "))
    val holt = TimeSeries.holtLinear(df, "k", "i", "x",
        alpha = 0.5, beta = 0.5)
      .select(hex($"k").as("k"), $"i", $"level")
      .as[(String, Int, Double)].collect().sortBy(r => (r._1, r._2))
    // second row per key must SMOOTH (0.5·x + 0.5·(level+trend)),
    // not re-seed at x
    assert(holt.map(_._3).toSeq == Seq(10.0, 15.0, 23.75, 100.0, 150.0),
      holt.mkString(", "))
  }

  test("ema: alpha out of range is rejected") {
    assertThrows[IllegalArgumentException] {
      TimeSeries.ema(bars, "symbol", "timestamp", "close", alpha = 0.0)
    }
  }

  test("holtLinear: level+trend match a hand-rolled fold; a linear ramp converges on its slope") {
    // pure linear series 10, 20, 30, …: Holt's trend should converge
    // toward the true slope (10/step)
    val ramp = (1 to 40).map(i =>
      ("R", Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i - 1)),
        i * 10.0)).toDF("symbol", "timestamp", "close")
    val rows = TimeSeries.holtLinear(ramp, "symbol", "timestamp", "close",
        alpha = 0.5, beta = 0.25)
      .orderBy("timestamp")
      .select($"close", $"level", $"trend")
      .as[(Double, Double, Double)].collect()
    // replay the recurrence exactly
    var l = 0.0; var tr = 0.0; var first = true
    rows.foreach { case (x, gl, gt) =>
      if (first) { l = x; tr = 0.0; first = false }
      else {
        val prev = l
        l = 0.5 * x + 0.5 * (l + tr)
        tr = 0.25 * (l - prev) + 0.75 * tr
      }
      assert(gl == l && gt == tr)
    }
    assert(math.abs(rows.last._3 - 10.0) < 1.0,
      s"trend should approach the ramp slope, got ${rows.last._3}")
  }
}
