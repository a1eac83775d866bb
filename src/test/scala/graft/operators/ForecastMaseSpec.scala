package graft.operators

import graft.SparkSpec

/** ev_forecast_mase: the backtest recounts from a serial daily fold,
  * and the frame laws hold — every day with both lags participates
  * (n_days = |days| − 7 on this gap-free corpus) and the permille is
  * the exact floor ratio of the shipped error sums.
  */
class ForecastMaseSpec extends SparkSpec {

  test("MASE recounts from a serial daily fold") {
    val dir = sf("sf0.001")
    val daily = spark.read.parquet(dir + "/events.parquet")
      .selectExpr(
        "CAST(datediff(date_trunc('day', ts), DATE '2024-01-01') AS LONG) AS t")
      .collect().map(_.getLong(0))
      .groupBy(identity).map { case (t, g) => t -> g.length.toLong }
    val rows = daily.keys.toSeq.sorted.flatMap { t =>
      for (x1 <- daily.get(t - 1); x7 <- daily.get(t - 7))
        yield (math.abs(daily(t) - x7), math.abs(daily(t) - x1))
    }
    val sn = rows.map(_._1).sum
    val nv = rows.map(_._2).sum
    val got = Events.forecastMase(spark, dir).collect().head
    assert(got.getLong(0) == rows.length.toLong, "n_days")
    assert(got.getLong(1) == sn, "snaive_abs_err")
    assert(got.getLong(2) == nv, "naive_abs_err")
    assert(got.getLong(3) == 1000L * sn / nv, "mase_pm floor ratio")
    assert(got.getLong(0) == daily.size.toLong - 7, "gap-free frame")
    assert(got.getLong(3) >= 0L)
  }
}
