package graft.operators

import graft.SparkSpec

/** ev_did: serial recount of the four cell means and the DiD fold, plus
  * the identification law — adding a constant uplift to every POST event
  * (both groups) leaves the DiD estimate unchanged (a common shock is
  * differenced out; that is the parallel-trends algebra the estimator
  * rests on), while adding it only to the TREAT-POST cell moves DiD by
  * exactly that constant.
  */
class DidSpec extends SparkSpec {

  private val cutMicros =
    java.time.LocalDate.parse("2024-01-16")
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli * 1000L

  private def cellsOf(rows: Seq[(Long, Long, Long)])
      : Map[(Boolean, Boolean), (Long, Long)] =
    rows.groupBy { case (u, ts, _) => (u % 2 == 0, ts >= cutMicros) }
      .map { case (k, xs) => k -> (xs.length.toLong, xs.map(_._3).sum) }

  test("DiD matches a serial recount of the four cells") {
    val dir = sf("sf0.001")
    import spark.implicits._
    val rows = graft.sources.Tables.events(spark, dir)
      .selectExpr("user_id", "unix_micros(ts) AS tsu",
        "CAST(round(value * 100) AS LONG) AS v")
      .as[(Long, Long, Long)].collect().toSeq
    val c = cellsOf(rows)
    def mean(t: Boolean, p: Boolean): Double = {
      val (n, s) = c((t, p)); s.toDouble / n
    }
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = r4((mean(true, true) - mean(true, false)
      - mean(false, true) + mean(false, false)) / 100d)
    val row = Events.didEstimate(spark, dir).head()
    assert(row.getLong(0) == c((true, true))._1)
    assert(row.getLong(3) == c((false, false))._1)
    assert(row.getDouble(8) == want, s"did ${row.getDouble(8)} != $want")
  }

  test("a common post-period shock is differenced out; a treat-only one is not") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val base = (0L until 400L).map { i =>
      // users 0..19; period alternates per 20-event BLOCK so every user
      // (both parities) has pre AND post events — all four cells populated
      (i, i % 20L,
        if ((i / 20L) % 2L == 0L) "2024-01-10 00:00:00"
        else "2024-01-20 00:00:00",
        (i % 7L).toDouble)
    }
    def write(df: org.apache.spark.sql.DataFrame, d: String): String = {
      val work = java.nio.file.Files.createTempDirectory("did").toString
      df.write.mode("overwrite").parquet(s"$work/events.parquet")
      work
    }
    def mk(uplift: (Long, Boolean) => Double) = {
      val rows = base.map { case (i, u, ts, v) =>
        val post = ts.startsWith("2024-01-20")
        (i, u, ts, v + uplift(u, post))
      }
      rows.toDF("event_id", "user_id", "tss", "value")
        .select($"event_id", $"user_id",
          to_timestamp($"tss").as("ts"), lit("click").as("event_type"),
          $"value", lit("{}").as("props"))
    }
    val d0 = write(mk((_, _) => 0d), "a")
    val d1 = write(mk((_, p) => if (p) 3.25 else 0d), "b") // common shock
    val d2 = write(mk((u, p) => if (p && u % 2 == 0) 3.25 else 0d), "c")
    val did0 = Events.didEstimate(spark, d0).head().getDouble(8)
    val did1 = Events.didEstimate(spark, d1).head().getDouble(8)
    val did2 = Events.didEstimate(spark, d2).head().getDouble(8)
    assert(did1 == did0, s"common shock moved DiD: $did0 -> $did1")
    assert(math.abs(did2 - did0 - 3.25) < 1e-9,
      s"treat-only shock of 3.25 moved DiD by ${did2 - did0}")
  }
}
