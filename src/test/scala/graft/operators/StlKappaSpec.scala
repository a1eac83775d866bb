package graft.operators

import graft.SparkSpec

/** ev_stl_daily + eval_cohens_kappa: serial recounts and the exact
  * decomposition / agreement laws.
  */
class StlKappaSpec extends SparkSpec {

  test("stl: 7·cnt = trend7 + seasonal7 + rem7 exactly; serial recount") {
    val dir = sf("sf0.001")
    val got = Events.stlDaily(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.nonEmpty)
    got.foreach { case (day, cnt, t7, s7, r7) =>
      assert(7L * cnt == t7 + s7 + r7, s"decomposition law broken at $day")
    }
    // serial recount of trend and seasonal
    val daily = spark.read.parquet(dir + "/events.parquet")
      .selectExpr("date_format(date_trunc('day', ts), 'yyyy-MM-dd') AS day")
      .collect().map(_.getString(0))
      .groupBy(identity).map { case (d, g) => d -> g.length.toLong }
      .toSeq.sortBy(_._1)
    val days = daily.map(_._1)
    val cnts = daily.map(_._2)
    val center = (3 until days.length - 3).map { i =>
      val t7 = (i - 3 to i + 3).map(cnts).sum
      val dow = (java.time.LocalDate.parse(days(i)).toEpochDay % 7).toInt
      (days(i), cnts(i), t7, 7L * cnts(i) - t7, dow)
    }
    val seas = center.groupBy(_._5).map { case (dow, rs) =>
      dow -> math.floor(rs.map(_._4).sum.toDouble / rs.size).toLong
    }
    val want = center.map { case (d, c, t7, de7, dow) =>
      (d, c, t7, seas(dow), de7 - seas(dow))
    }.sortBy(_._1)
    assert(got.toSeq == want)
  }

  test("kappa: recount from the confusion matrix; bounded by 1") {
    val dir = sf("sf0.001")
    val preds = TextOps.langId(spark, dir).collect()
      .map(r => (r.getString(1), r.getString(r.length - 1)))
    val n = preds.length.toLong
    val d = preds.count { case (a, b) => a == b }.toLong
    val rm = preds.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val cm = preds.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val labels = (rm.keySet ++ cm.keySet).toSeq
    val sRc = labels.map(l => rm.getOrElse(l, 0L) * cm.getOrElse(l, 0L)).sum
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val row = TextOps.cohensKappa(spark, dir).head()
    assert(row.getLong(0) == n)
    assert(row.getLong(1) == d)
    assert(row.getDouble(2) == r4(d.toDouble / n))
    assert(row.getDouble(3) == r4(sRc.toDouble / (n * n)))
    val kappa = row.getDouble(4)
    assert(kappa == r4((n * d - sRc).toDouble / (n * n - sRc).toDouble))
    assert(kappa <= 1d)
    assert(kappa < row.getDouble(2),
      "chance correction must pull kappa below raw agreement here")
  }
}
