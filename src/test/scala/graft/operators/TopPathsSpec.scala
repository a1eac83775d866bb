package graft.operators

import graft.SparkSpec

/** ev_top_paths: the windowed trigram mine recounts from a serial fold
  * over per-user ordered timelines, and the output ordering/share laws
  * hold (counts non-increasing, shares consistent with the trigram total).
  */
class TopPathsSpec extends SparkSpec {

  private def truth(dir: String): Seq[(String, String, String, Long, Long)] = {
    import spark.implicits._
    val ev = spark.read.parquet(dir + "/events.parquet")
      .selectExpr("user_id", "cast(ts AS STRING)", "event_id", "event_type")
      .as[(Long, String, Long, String)].collect()
    val tris = ev.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      g.sortBy(r => (r._2, r._3)).map(_._4).sliding(3).filter(_.length == 3)
        .map(s => (s(0), s(1), s(2))).toSeq
    }
    val counts = tris.groupBy(identity).map { case (k, g) =>
      (k._1, k._2, k._3, g.length.toLong)
    }.toSeq
    val total = counts.map(_._4).sum
    counts.map { case (a, b, c, n) => (a, b, c, n, n * 1000L / total) }
      .sortBy(r => (-r._4, r._1, r._2, r._3)).take(10)
  }

  test("top-10 trigram paths recount from a serial timeline fold") {
    val dir = sf("sf0.001")
    val want = truth(dir)
    val got = Events.topPaths(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(want.nonEmpty)
    assert(got == want)
  }

  test("ordering and share laws") {
    val got = Events.topPaths(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(3), r.getLong(4)))
    assert(got.map(_._1).sliding(2).forall(p =>
      p.length < 2 || p(0) >= p(1)), "counts must be non-increasing")
    got.foreach { case (n, pm) =>
      assert(n >= 1L && pm >= 0L && pm <= 1000L, s"share bounds: ($n, $pm)")
    }
  }
}
