package graft.operators

import graft.SparkSpec

/** stat_kruskal_wallis: H recounts from a serial average-rank computation
  * with the textbook tie correction; rank-sum conservation law (ΣR_g =
  * N(N+1)/2) checked on the serial side.
  */
class KruskalWallisSpec extends SparkSpec {

  test("H recounts from serial average ranks with tie correction") {
    val dir = sf("sf0.001")
    val rows = spark.read.parquet(dir + "/orders.parquet")
      .selectExpr("o_orderpriority AS g",
        "cast(round(o_totalprice) as long) AS v").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val n = rows.length.toLong
    // doubled average ranks per value: 2r̄(v) = 2|{u<v}| + cnt(v) + 1
    val hist = rows.groupBy(_._2).map { case (v, g) => v -> g.length.toLong }
    val sortedVals = hist.keys.toSeq.sorted
    var before = 0L
    val r2 = sortedVals.map { v =>
      val out = v -> (2L * before + hist(v) + 1L)
      before += hist(v); out
    }.toMap
    // rank-sum conservation: Σ 2r̄ over all rows = N(N+1)
    assert(rows.map(r => r2(r._2)).sum == n * (n + 1L))
    val pg = rows.groupBy(_._1).map { case (g, rs) =>
      (g, rs.length.toLong, rs.map(r => r2(r._2)).sum)
    }
    val tSum = pg.map { case (_, ng, s2) =>
      math.floor(s2.toDouble * s2 / (4d * ng) * 100d).toLong
    }.sum
    val tie3 = hist.values.map(c => c * c * c - c).sum
    val nd = n.toDouble
    val h = (12d * (tSum / 100d) / (nd * (nd + 1d)) - 3d * (nd + 1d)) /
      (1d - tie3.toDouble / (nd * nd * nd - nd))
    val want = BigDecimal(h).setScale(4, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
    val row = Relational.statKruskalWallis(spark, dir).head()
    assert(row.getLong(0) == pg.size.toLong)
    assert(row.getLong(1) == n)
    assert(row.getDouble(2) == want, s"H ${row.getDouble(2)} vs $want")
  }
}
