package graft.operators

import graft.SparkSpec

/** ev_cuped: hand-computed θ/ρ² anchor plus a serial recount on the gate
  * corpus (the law: θ = cov(X,Y)/var(X) from exact per-user cent sums,
  * and a perfectly predictive pre-period drives the adjusted effect to
  * the randomization-balanced zero).
  */
class CupedSpec extends SparkSpec {

  private def writeEvents(rows: Seq[(Long, Long, String, Double)]): String = {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("cuped").toString
    rows.zipWithIndex.map { case ((uid, day, typ, v), i) =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00"),
        uid, typ, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$work/events.parquet")
    work
  }

  test("y = 2x exactly: theta = 2, rho2 = 1, cuped effect = 0") {
    import spark.implicits._
    // pre day 10, post day 20; y_u = 2 * x_u for every user, so the
    // pre-period predicts the outcome perfectly: all outcome variance is
    // pre-existing user heterogeneity, none is treatment
    val work = writeEvents(Seq(
      (0L, 10L, "a", 10.0), (0L, 20L, "a", 20.0), // treat (even)
      (2L, 10L, "a", 30.0), (2L, 20L, "a", 60.0), // treat
      (1L, 10L, "a", 20.0), (1L, 20L, "a", 40.0), // ctrl
      (3L, 10L, "a", 40.0), (3L, 20L, "a", 80.0))) // ctrl
    val got = Events.cupedEstimate(spark, work)
      .as[(Long, Long, Double, Double, Double, Double)].collect().head
    val (nT, nC, theta, raw, cuped, rho2) = got
    assert((nT, nC) == ((2L, 2L)))
    assert(theta == 2.0)
    assert(rho2 == 1.0)
    // raw effect: (20+60)/2 - (40+80)/2 = -20 dollars of pure user mix
    assert(raw == -20.0)
    assert(cuped == 0.0, s"cuped effect $cuped != 0 under y = 2x")
  }

  test("matches a serial moment recount on the gate corpus") {
    val dir = sf("sf0.001")
    import spark.implicits._
    val cut = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")
    val users = spark.read.parquet(s"$dir/events.parquet")
      .selectExpr("user_id", "ts", "CAST(round(value * 100) AS LONG) AS v")
      .as[(Long, java.sql.Timestamp, Long)].collect()
      .groupBy(_._1).map { case (u, xs) =>
        (u % 2 == 0,
          xs.filter(_._2.before(cut)).map(_._3).sum,
          xs.filterNot(_._2.before(cut)).map(_._3).sum)
      }.toSeq
    val n = users.size.toDouble
    val sx = users.map(_._2).sum
    val sy = users.map(_._3).sum
    val sxy = users.map(t => t._2 * t._3).sum
    val sxx = users.map(t => t._2 * t._2).sum
    val theta = (n * sxy - sx.toDouble * sy) / (n * sxx - sx.toDouble * sx)
    val got = Events.cupedEstimate(spark, dir)
      .as[(Long, Long, Double, Double, Double, Double)].collect().head
    assert(got._1 == users.count(_._1) && got._2 == users.count(!_._1))
    assert(math.abs(got._3 - theta) < 1e-5,
      s"theta ${got._3} vs recount $theta")
    val t = users.filter(_._1)
    val c = users.filterNot(_._1)
    val cuped = (t.map(_._3).sum.toDouble / t.size
      - theta * t.map(_._2).sum / t.size) -
      (c.map(_._3).sum.toDouble / c.size - theta * c.map(_._2).sum / c.size)
    assert(math.abs(got._5 - cuped / 100d) < 1e-3)
  }
}
