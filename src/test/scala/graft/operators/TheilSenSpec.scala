package graft.operators

import graft.SparkSpec

/** stat_theil_sen: the distributed median-of-pairwise-slopes recounts
  * from a serial enumeration over the collected monthly frame under the
  * same (slope, m1, m2) total order, and n_pairs is exactly C(months, 2)
  * per segment — the pair generator neither drops nor duplicates.
  */
class TheilSenSpec extends SparkSpec {

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

  test("per-segment median slope recounts from serial pair enumeration") {
    val dir = sf("sf0.001")
    val mo = monthly(dir)
    val want = mo.keys.map(_._1).toSeq.distinct.sorted.map { seg =>
      val pts = mo.filter(_._1._1 == seg).toSeq
        .map { case ((_, m), rev) => (m, rev) }.sortBy(_._1)
      val sl = for (i <- pts.indices; j <- (i + 1) until pts.length) yield {
        val (m1, r1) = pts(i); val (m2, r2) = pts(j)
        val dr = r2 - r1
        val sm = dr.sign * (1000000L * math.abs(dr) / (m2 - m1))
        (sm, m1, m2)
      }
      val sorted = sl.sorted
      val med = sorted((sorted.length + 1) / 2 - 1)
      (seg, sl.length.toLong, med._1)
    }
    val got = Relational.statTheilSen(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == want)
  }

  test("pair counts are exactly C(months, 2) per segment") {
    val dir = sf("sf0.001")
    val mo = monthly(dir)
    val monthsPerSeg = mo.keys.groupBy(_._1).map { case (s, g) =>
      s -> g.size.toLong
    }
    val got = Relational.statTheilSen(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val k = monthsPerSeg(r.getString(0))
      assert(r.getLong(1) == k * (k - 1) / 2, s"C($k,2) for ${r.getString(0)}")
    }
  }
}
