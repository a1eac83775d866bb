package graft.operators

import graft.SparkSpec

/** rec_market_basket: the distributed basket-keyed pair counting recounts
  * from a serial fold over collected baskets, with the same permille
  * arithmetic (BigInt in the truth — no intermediate overflow), and the
  * support lattice law s_ab ≤ min(s_a, s_b) holds pairwise.
  */
class MarketBasketSpec extends SparkSpec {

  private def truth(dir: String) = {
    val items = spark.read.parquet(dir + "/lineitem.parquet")
      .selectExpr("l_orderkey AS o", "l_partkey AS p")
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val nOrders = items.map(_._1).distinct.length.toLong
    val supp = items.groupBy(_._2).map { case (p, g) => p -> g.length.toLong }
    val pairs = items.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      val ps = g.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.groupBy(identity).map { case (k, g) => k -> g.length.toLong }
      .filter(_._2 >= 2L)
    val rows = pairs.toSeq.map { case ((pa, pb), sab) =>
      val sa = supp(pa); val sb = supp(pb)
      val conf = 1000L * sab / sa
      val lift = (BigInt(1000) * sab * nOrders / (BigInt(sa) * sb)).toLong
      (pa, pb, sab, sa, sb, conf, lift)
    }
    rows.sortBy(r => (-r._7, -r._3, r._1, r._2)).take(20)
  }

  test("top-20 rules recount from a serial basket fold") {
    val dir = sf("sf0.001")
    val want = truth(dir)
    val got = Affinity.marketBasket(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toSeq == want.toSeq)
  }

  test("pair support never exceeds either item support") {
    val got = Affinity.marketBasket(spark, sf("sf0.001")).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (sab, sa, sb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(sab >= 2L && sab <= math.min(sa, sb), s"lattice: $r")
      assert(r.getLong(5) <= 1000L, "confidence is a probability")
    }
  }
}
