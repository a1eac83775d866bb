package graft.operators

import graft.SparkSpec

/** ev_attribution_linear: per-channel credit recounts from a serial
  * multi-touch split, and the conservation law holds — every converted
  * purchase hands out EXACTLY 1000 permille across its touches, so the
  * channel totals sum to 1000 × |purchases with ≥1 touch|.
  */
class AttributionLinearSpec extends SparkSpec {

  private def events(dir: String) =
    spark.read.parquet(dir + "/events.parquet")
      .selectExpr("event_id", "user_id", "event_type",
        "unix_micros(CAST(ts AS TIMESTAMP)) AS us",
        "CAST(get_json_object(props, '$.k') AS LONG) AS k")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4)))

  test("channel credit recounts from a serial multi-touch split") {
    val dir = sf("sf0.001")
    val ev = events(dir)
    val horizon = 30L * 60 * 1000000
    val byUser = ev.groupBy(_._2)
    val credits = ev.filter(_._3 == "purchase").flatMap {
      case (pid, u, _, pts, _) =>
        val touches = byUser.getOrElse(u, Array.empty[(Long, Long, String,
          Long, Long)])
          .filter(c => c._3 == "click" && c._4 <= pts &&
            c._4 >= pts - horizon)
          .sortBy(c => (-c._4, -c._1)) // recency order, id tie-break
        val n = touches.length.toLong
        touches.zipWithIndex.map { case (c, i) =>
          val credit = 1000L / n + (if (i + 1 <= 1000L % n) 1L else 0L)
          (c._5 / 10L, pid, credit)
        }
    }
    val want = credits.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (ch, g) =>
        (ch, g.map(_._2).distinct.length.toLong, g.length.toLong,
          g.map(_._3).sum)
    }
    val got = Events.attributionLinear(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == want)
    // conservation: total credit = 1000 per converted purchase
    val converted = credits.map(_._2).distinct.length.toLong
    assert(got.map(_._4).sum == 1000L * converted, "exact conservation")
  }
}
