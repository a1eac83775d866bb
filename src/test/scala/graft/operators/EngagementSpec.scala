package graft.operators

import java.time.LocalDate

import graft.SparkSpec
import graft.sources.Tables

/** dauRolling / rfm: exact in-memory recomputation over the collected
  * sf0.001 events, plus the structural laws each contract promises.
  */
class EngagementSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  private def dayUsers(): Array[(LocalDate, Long)] = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select(org.apache.spark.sql.functions.to_date($"ts").cast("string"),
        $"user_id")
      .as[(String, Long)].collect()
      .map { case (d, u) => (LocalDate.parse(d), u) }
  }

  test("dauRolling matches an exact recount and wau7 dominates dau") {
    val du = dayUsers().distinct
    val days = du.map(_._1).distinct
    val expect = days.map { d =>
      val dau = du.count(_._1 == d).toLong
      val wau = du.filter { case (ed, _) =>
        !ed.isAfter(d) && ed.isAfter(d.minusDays(7))
      }.map(_._2).distinct.length.toLong
      d.toString -> ((dau, wau))
    }.toMap
    val got = Events.dauRolling(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expect)
    // a day's rolling-7 distinct can never be smaller than that day alone
    got.values.foreach { case (dau, wau) => assert(wau >= dau) }
    assert(got.nonEmpty)
  }

  test("seasonality conserves events and stays within the 7x24 grid") {
    import spark.implicits._
    val total = Tables.events(spark, dir).count()
    val rows = Events.seasonality(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._3).sum == total)
    rows.foreach { case (dow, hod, n, pm) =>
      assert(dow >= 1L && dow <= 7L)
      assert(hod >= 0L && hod <= 23L)
      assert(pm == n * 1000L / total)
    }
    // an in-memory recount of one arbitrary cell
    val ev = Tables.events(spark, dir)
      .select($"ts".cast("string")).as[String].collect()
      .map(t => java.time.LocalDateTime.parse(t.replace(" ", "T")))
    val cell = rows.head
    val expect = ev.count(t =>
      t.getDayOfWeek.getValue.toLong == cell._1 &&
        t.getHour.toLong == cell._2).toLong
    assert(cell._3 == expect)
  }

  test("rfm matches an exact recount and quintiles are balanced") {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select(org.apache.spark.sql.functions.to_date($"ts").cast("string"),
        $"user_id", $"value")
      .as[(String, Long, Double)].collect()
      .map { case (d, u, v) =>
        (LocalDate.parse(d), u, math.round(v * 100))
      }
    val anchor = ev.map(_._1).maxBy(_.toEpochDay)
    val expect = ev.groupBy(_._2).map { case (u, rows) =>
      val last = rows.map(_._1).maxBy(_.toEpochDay)
      u -> ((anchor.toEpochDay - last.toEpochDay,
        rows.length.toLong, rows.map(_._3).sum))
    }
    val got = Events.rfm(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expect)
    // quintile balance: ntile(5) sizes differ by at most one
    val rows = Events.rfm(spark, dir).collect()
    for (col <- Seq(4, 5, 6)) {
      val sizes = rows.groupBy(_.getLong(col)).view.mapValues(_.length)
      assert(sizes.keys.toSet == (1L to 5L).toSet)
      assert(sizes.values.max - sizes.values.min <= 1)
    }
    // recency quintile 1 holds the most recently active users
    val byQ = rows.groupBy(_.getLong(4)).view
      .mapValues(_.map(_.getLong(1)))
    assert(byQ(1L).max <= byQ(5L).min)
  }
}
