package graft.operators

import graft.SparkSpec

/** resampleLocf: the regular-grid laws — per user one row per day over a
  * dense first..last span, observed days equal the day's last event value
  * (ts/event_id-deterministic), gap days carry the previous value, and
  * the first grid day is always observed (no leading null to carry).
  */
class ResampleLocfSpec extends SparkSpec {

  private lazy val rows =
    Events.resampleLocf(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))

  test("grid is dense per user and starts/ends on observed days") {
    rows.groupBy(_._1).foreach { case (u, rs) =>
      val days = rs.map(_._2).sorted
      val d0 = java.time.LocalDate.parse(days.head)
      val d1 = java.time.LocalDate.parse(days.last)
      assert(days.length ==
        java.time.temporal.ChronoUnit.DAYS.between(d0, d1) + 1,
        s"user $u: grid has holes")
      assert(rs.minBy(_._2)._4 == 0L, s"user $u: first day must be observed")
      assert(rs.maxBy(_._2)._4 == 0L, s"user $u: last day must be observed")
    }
  }

  test("filled days carry exactly the previous day's value") {
    rows.groupBy(_._1).foreach { case (u, rs) =>
      val byDay = rs.sortBy(_._2)
      byDay.sliding(2).foreach {
        case Array((_, _, v0, _), (_, d1, v1, f1)) =>
          if (f1 == 1L)
            assert(v1 == v0, s"user $u day $d1: carried value drifted")
        case _ =>
      }
    }
  }

  test("observed days equal the day-last event value (recount)") {
    val ev = spark.read.parquet(sf("sf0.001") + "/events.parquet")
      .select("user_id", "ts", "event_id", "value").collect()
      .map { r =>
        val ts = r.getAs[java.time.LocalDateTime](1)
        // full-precision order key (epoch-second·1e9 + nanos): the data
        // carries microseconds, and a millisecond truncation could argmax
        // a different event than Spark's full-precision struct max
        (r.getLong(0), ts.toLocalDate.toString,
          ts.toInstant(java.time.ZoneOffset.UTC).getEpochSecond *
            1000000000L + ts.getNano,
          r.getLong(2), r.getDouble(3))
      }
    val expected = ev.groupBy(e => (e._1, e._2)).map { case (k, es) =>
      k -> es.maxBy(e => (e._3, e._4))._5
    }
    rows.filter(_._4 == 0L).foreach { case (u, d, v, _) =>
      assert(expected((u, d)) == v, s"user $u day $d: not the day-last value")
    }
    assert(rows.count(_._4 == 0L) == expected.size,
      "every observed (user, day) must surface exactly once")
  }
}
