package graft.operators

import graft.SparkSpec

/** stat_mann_kendall: S and τ recount from serial pair enumeration over
  * the collected monthly frame, and the Kendall bounds hold — |S| ≤
  * C(n,2) so |τ_pm| ≤ 1000, with the Theil–Sen median slope's SIGN
  * agreeing with S whenever S is decisive (the classic pairing law:
  * the median pairwise slope is positive iff more pairs rise than fall).
  */
class MannKendallSpec extends SparkSpec {

  private def monthly(dir: String) = {
    val o = spark.read.parquet(dir + "/orders.parquet")
      .selectExpr("o_custkey",
        "CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS LONG) AS m",
        "CAST(round(o_totalprice * 100) AS LONG) AS cents")
    val c = spark.read.parquet(dir + "/customer.parquet")
      .selectExpr("c_custkey", "c_mktsegment AS seg")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .selectExpr("seg", "m", "cents")
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2)))
      .groupBy(_._1).map { case (k, g) => k -> g.map(_._2).sum }
  }

  test("S and tau recount from serial pair enumeration") {
    val dir = sf("sf0.001")
    val mo = monthly(dir)
    val want = mo.keys.map(_._1).toSeq.distinct.sorted.map { seg =>
      val pts = mo.filter(_._1._1 == seg).toSeq
        .map { case ((_, m), rev) => (m, rev) }.sortBy(_._1)
      val sgns = for (i <- pts.indices; j <- (i + 1) until pts.length)
        yield (pts(j)._2 - pts(i)._2).sign
      val s = sgns.map(_.toLong).sum
      val n = sgns.length.toLong
      (seg, n, s, s.sign * (1000L * math.abs(s) / n))
    }
    val got = Relational.statMannKendall(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == want)
  }

  test("Kendall bounds and Theil-Sen sign agreement") {
    val dir = sf("sf0.001")
    val mk = Relational.statMannKendall(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val ts = Relational.statTheilSen(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(mk.nonEmpty && mk.keySet == ts.keySet)
    mk.foreach { case (seg, (n, s, tau)) =>
      assert(math.abs(s) <= n, s"$seg |S| <= C(n,2)")
      assert(math.abs(tau) <= 1000L, s"$seg tau band")
      // the median slope is positive iff strictly more pairs rise than
      // fall ONLY when S is decisive past the tie mass; assert the weak
      // direction: a decisively positive S (tau beyond the tie share)
      // cannot coexist with a negative median slope, and vice versa
      val ties = n - math.abs(s) - (n - math.abs(s)) / 2 * 2 // parity slack
      if (math.abs(s) > n / 2)
        assert(s.sign * ts(seg).sign >= 0, s"$seg decisive-sign agreement")
      assert(ties >= 0)
    }
  }
}
