package graft.operators

import graft.SparkSpec

/** statGroupOls: the sufficient-statistic slope recounts from collected
  * rows with BigInt arithmetic (no intermediate overflow in the truth),
  * and slope_pm equals floor(1000·num/den) exactly.
  */
class GroupOlsSpec extends SparkSpec {

  test("per-group slope recounts from BigInt sufficient statistics") {
    val dir = sf("sf0.001")
    val rows = spark.read.parquet(dir + "/lineitem.parquet")
      .selectExpr("l_returnflag", "l_linestatus",
        "CAST(l_quantity AS LONG) AS x",
        "CAST(round(l_extendedprice) AS LONG) AS y")
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
    val truth = rows.groupBy(_._1).map { case (k, g) =>
      val xs = g.map(_._2)
      val n = BigInt(xs.length)
      val sx = xs.map(v => BigInt(v._1)).sum
      val sy = xs.map(v => BigInt(v._2)).sum
      val sxy = xs.map(v => BigInt(v._1) * v._2).sum
      val sxx = xs.map(v => BigInt(v._1) * v._1).sum
      val num = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      val pm = num.signum * (num.abs * 1000 / den).toLong
      k -> (n.toLong, num, den, pm)
    }
    val got = Relational.statGroupOls(spark, dir).collect()
    assert(got.length == truth.size)
    got.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      val (n, num, den, pm) = truth(k)
      assert(r.getLong(2) == n, s"$k n")
      assert(BigInt(r.getLong(3)) == num, s"$k num")
      assert(BigInt(r.getLong(4)) == den, s"$k den")
      assert(r.getLong(5) == pm, s"$k slope_pm")
    }
  }

  test("denominator is positive and slopes stay in a sane band") {
    // this corpus draws price only loosely correlated with quantity
    // (some cohorts even slope negative at sf0.001) — the invariants
    // are den > 0 (quantity is never constant within a group) and a
    // magnitude band, not a sign
    val got = Relational.statGroupOls(spark, sf("sf0.001")).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(4) > 0, "den positive")
      val pm = r.getLong(5)
      assert(math.abs(pm) < 10000000L, s"|slope_pm| $pm >= 1e7")
      assert(pm.sign.toLong == r.getLong(3).sign.toLong,
        "slope sign matches numerator sign")
    }
  }
}
