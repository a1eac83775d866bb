package graft.operators

import graft.SparkSpec

/** stat_welch_t: the one-pass conditional fold recounts from a serial
  * two-cohort computation with the same integer sufficient statistics and
  * the same scalar double math; plus the analytic laws — the
  * Welch–Satterthwaite df sits in [min(n)−1, n1+n2−2] and the t sign
  * matches the mean difference.
  */
class WelchTSpec extends SparkSpec {

  private def round(x: Double, s: Int): Double =
    BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("fold equals the serial two-cohort recount") {
    import spark.implicits._
    val dir = sf("sf0.001")
    val rows = spark.read.parquet(dir + "/orders.parquet")
      .selectExpr("round(o_totalprice)::LONG AS v",
        "o_orderdate < '1998-06-01' AS a")
      .as[(Long, Boolean)].collect()
    val (g1, g2) = rows.partition(_._2)
    def stats(g: Array[(Long, Boolean)]) = {
      val n = g.length.toLong
      val s = g.map(_._1).sum
      val q = g.map(r => r._1 * r._1).sum
      val m = s.toDouble / n
      val v = (q.toDouble - s.toDouble * s / n) / (n - 1)
      (n, m, v)
    }
    val (n1, m1, v1) = stats(g1)
    val (n2, m2, v2) = stats(g2)
    val se2 = v1 / n1 + v2 / n2
    val t = round((m1 - m2) / math.sqrt(se2), 4)
    val df = round(se2 * se2 / ((v1 / n1) * (v1 / n1) / (n1 - 1)
      + (v2 / n2) * (v2 / n2) / (n2 - 1)), 2)

    val got = Relational.statWelchT(spark, dir).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(0) == n1 && r.getLong(1) == n2)
    assert(r.getDouble(2) == round(m1, 2) && r.getDouble(3) == round(m2, 2))
    assert(r.getDouble(4) == t, s"t: ${r.getDouble(4)} vs $t")
    assert(r.getDouble(5) == df, s"df: ${r.getDouble(5)} vs $df")
  }

  test("analytic laws: df bounds and t sign") {
    val r = Relational.statWelchT(spark, sf("sf0.001")).collect().head
    val (n1, n2) = (r.getLong(0), r.getLong(1))
    val df = r.getDouble(5)
    assert(df >= math.min(n1, n2) - 1.0 && df <= (n1 + n2 - 2).toDouble,
      s"Welch–Satterthwaite df out of its bracket: $df")
    val signMean = math.signum(r.getDouble(2) - r.getDouble(3))
    assert(math.signum(r.getDouble(4)) == signMean || r.getDouble(4) == 0.0,
      "t must carry the sign of the mean difference")
  }
}
