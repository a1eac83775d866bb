package graft.operators

import graft.SparkSpec

/** stat_spearman: the histogram-cumsum tie-averaged ranks and both
  * correlation scalars recount from a serial computation, and the
  * analytic laws hold (|ρ| ≤ 1, rank-sum identity Σ2r̄ = n(n+1)).
  */
class SpearmanSpec extends SparkSpec {

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def pairs(dir: String): Array[(Long, Long)] = {
    import spark.implicits._
    val o = spark.read.parquet(dir + "/orders.parquet")
      .selectExpr("o_custkey", "round(o_totalprice)::LONG AS x")
      .as[(Long, Long)].collect()
    val c = spark.read.parquet(dir + "/customer.parquet")
      .selectExpr("c_custkey", "round(c_acctbal)::LONG AS y")
      .as[(Long, Long)].collect().toMap
    o.map { case (ck, x) => (x, c(ck)) }
  }

  private def ranks2(vs: Array[Long]): Map[Long, Long] = {
    val hist = vs.groupBy(identity).map { case (v, g) => v -> g.length.toLong }
    val sorted = hist.toSeq.sortBy(_._1)
    var before = 0L
    sorted.map { case (v, cnt) =>
      val r = 2L * before + cnt + 1L
      before += cnt
      v -> r
    }.toMap
  }

  private def pearson(xs: Array[Long], ys: Array[Long]): Double = {
    val n = xs.length.toDouble
    val (sx, sy) = (xs.sum.toDouble, ys.sum.toDouble)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum.toDouble
    val sxx = xs.map(a => a * a).sum.toDouble
    val syy = ys.map(a => a * a).sum.toDouble
    (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
  }

  test("both correlations recount serially with tie-averaged ranks") {
    val dir = sf("sf0.001")
    val ps = pairs(dir)
    val rx = ranks2(ps.map(_._1))
    val ry = ranks2(ps.map(_._2))
    val wantS = round4(pearson(ps.map(p => rx(p._1)), ps.map(p => ry(p._2))))
    val wantP = round4(pearson(ps.map(_._1), ps.map(_._2)))
    val r = Relational.statSpearman(spark, dir).collect().head
    assert(r.getLong(0) == ps.length.toLong)
    assert(r.getDouble(1) == wantS, s"spearman ${r.getDouble(1)} vs $wantS")
    assert(r.getDouble(2) == wantP, s"pearson ${r.getDouble(2)} vs $wantP")
  }

  test("laws: |rho| <= 1 and the doubled rank-sum identity") {
    val dir = sf("sf0.001")
    val r = Relational.statSpearman(spark, dir).collect().head
    assert(math.abs(r.getDouble(1)) <= 1.0)
    assert(math.abs(r.getDouble(2)) <= 1.0)
    val ps = pairs(dir)
    val rx = ranks2(ps.map(_._1))
    val n = ps.length.toLong
    assert(ps.map(p => rx(p._1)).sum == n * (n + 1L),
      "tie-averaged doubled ranks must sum to n(n+1)")
  }
}
