package graft.operators

import graft.SparkSpec

/** ev_window_funnel: the stacked-window greedy chain recounts from a
  * serial per-user timeline walk (earliest click ≥ view, earliest
  * purchase ≥ that click, 6-hour window), and the histogram conserves the
  * user population.
  */
class WindowFunnelSpec extends SparkSpec {

  private val H = 21600000000L

  private def truth(dir: String): Map[Long, Long] = {
    import spark.implicits._
    val ev = spark.read.parquet(dir + "/events.parquet")
      .selectExpr("user_id", "unix_micros(cast(ts AS TIMESTAMP)) AS m", "event_type")
      .as[(Long, Long, String)].collect()
    val byUser = ev.groupBy(_._1)
    val stages = byUser.map { case (_, g) =>
      val views = g.filter(_._3 == "view").map(_._2)
      val clicks = g.filter(_._3 == "click").map(_._2).sorted
      val purch = g.filter(_._3 == "purchase").map(_._2).sorted
      if (views.isEmpty) 0L
      else views.map { v =>
        clicks.find(_ >= v) match {
          case None => 1L
          case Some(c) =>
            purch.find(_ >= c) match {
              case Some(p) if p - v <= H => 3L
              case _ => if (c - v <= H) 2L else 1L
            }
        }
      }.max
    }
    stages.groupBy(identity).map { case (s, g) => s -> g.size.toLong }
  }

  test("stage histogram equals the serial timeline walk") {
    val dir = sf("sf0.001")
    val want = truth(dir)
    val got = Events.windowFunnel(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("population conservation and stage domain") {
    import spark.implicits._
    val dir = sf("sf0.001")
    val got = Events.windowFunnel(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nUsers = spark.read.parquet(dir + "/events.parquet")
      .selectExpr("user_id").distinct().count()
    assert(got.map(_._2).sum == nUsers, "every user lands in one stage")
    assert(got.map(_._1).forall(s => s >= 0L && s <= 3L))
    assert(got.map(_._1).distinct.length == got.length)
  }
}
