package graft.operators

import graft.SparkSpec

/** ewma: the dyadic smoothing recounts per user from a serial fold over
  * the (ts, event_id)-ordered history, and the depth-8 truncation bound
  * holds (ewma is a convex-ish combination: |ewma·256| ≤ 256·max|v|).
  */
class EwmaSpec extends SparkSpec {

  test("final dyadic EWMA recounts from each user's ordered history") {
    val dir = sf("sf0.001")
    val hist = graft.sources.Tables.events(spark, dir)
      .selectExpr("user_id", "ts", "event_id",
        "CAST(round(value * 100) AS LONG) AS vc")
      .collect()
      .map(r => (r.getLong(0), (r.getTimestamp(1).getTime, r.getLong(2),
        r.getLong(3))))
      .groupBy(_._1)
      .map { case (u, rows) =>
        val ordered = rows.map(_._2).sortBy(t => (t._1, t._2)).map(_._3)
        val last8 = ordered.takeRight(8).reverse // k=0 is the newest
        val ewma = last8.zipWithIndex.map { case (v, k) =>
          v * (1L << (7 - k))
        }.sum
        u -> (ordered.length.toLong, ordered.last, ewma)
      }
    val got = Events.ewma(spark, dir).collect()
    assert(got.length == hist.size)
    got.foreach { r =>
      val u = r.getLong(0)
      val (n, last, ewma) = hist(u)
      assert(r.getLong(1) == n, s"user $u n_events")
      assert(r.getLong(2) == last, s"user $u last_cents")
      assert(r.getLong(3) == ewma, s"user $u ewma_x256")
    }
  }

  test("smoothed value is bounded by 256 x the max |value| in the tail") {
    val got = Events.ewma(spark, sf("sf0.001")).collect()
    assert(got.nonEmpty)
    val maxAbs = graft.sources.Tables.events(spark, sf("sf0.001"))
      .selectExpr("max(abs(CAST(round(value * 100) AS LONG)))")
      .collect().head.getLong(0)
    got.foreach { r =>
      assert(math.abs(r.getLong(3)) <= 256L * maxAbs)
    }
  }
}
