package graft.operators

import graft.SparkSpec

/** survivalTable: the life-table laws — every row recounts from a
  * serial per-user time-to-first-purchase sweep, n_risk telescopes
  * (risk set at day t = everyone minus those who exited earlier), and
  * the table conserves the user population.
  */
class SurvivalSpec extends SparkSpec {

  private def serial(dir: String): Seq[(Long, Long, Long, Long)] = {
    val rows = graft.sources.Tables.events(spark, dir)
      .selectExpr("user_id", "CAST(ts AS DATE) AS d", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getString(2)))
    val mx = rows.map(_._2).maxBy(_.toEpochDay)
    // .toSeq BEFORE .map: mapping a Map to (day, cens) pairs would
    // re-key and silently collapse users sharing the same tuple
    val users = rows.groupBy(_._1).toSeq.map { case (_, es) =>
      val f = es.map(_._2).minBy(_.toEpochDay)
      val ps = es.filter(_._3 == "purchase").map(_._2)
      if (ps.nonEmpty)
        (ps.minBy(_.toEpochDay).toEpochDay - f.toEpochDay, false)
      else (mx.toEpochDay - f.toEpochDay, true)
    }
    val hist = users.groupBy(_._1).toSeq.map { case (day, g) =>
      (day, g.count(!_._2).toLong, g.count(_._2).toLong)
    }.sortBy(_._1)
    val total = users.length.toLong
    var exited = 0L
    hist.map { case (day, d, c) =>
      val nRisk = total - exited
      exited += d + c
      (day, nRisk, d, c)
    }
  }

  test("life table recounts from the serial time-to-purchase sweep") {
    val dir = sf("sf0.001")
    val truth = serial(dir)
    val got = Events.survivalTable(spark, dir).collect()
    assert(got.length == truth.length)
    got.zip(truth).foreach { case (r, (day, nRisk, d, c)) =>
      assert(r.getLong(0) == day, s"day $day")
      assert(r.getLong(1) == nRisk, s"day $day n_risk")
      assert(r.getLong(2) == d, s"day $day d_events")
      assert(r.getLong(3) == c, s"day $day censored")
      assert(r.getLong(4) == 1000L * d / nRisk, s"day $day hazard_pm")
    }
  }

  test("risk set telescopes and the table conserves the population") {
    val dir = sf("sf0.001")
    val nUsers = graft.sources.Tables.events(spark, dir)
      .select("user_id").distinct().count()
    val got = Events.survivalTable(spark, dir).collect()
    assert(got.nonEmpty)
    assert(got.head.getLong(1) == nUsers, "first-row risk set = all users")
    assert(got.map(r => r.getLong(2) + r.getLong(3)).sum == nUsers,
      "exits conserve the population")
    got.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getLong(1) == a.getLong(1) - a.getLong(2) - a.getLong(3),
          s"n_risk telescopes at day ${b.getLong(0)}")
      case _ =>
    }
    got.foreach(r => assert(r.getLong(1) > 0, "n_risk positive"))
    assert(got.map(_.getLong(2)).sum > 0, "some users actually convert")
  }
}
