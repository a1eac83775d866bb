package graft.operators

import graft.SparkSpec

/** stat_chi2: recounts from a serial contingency-table chi-squared with
  * the marginal law (expectations sum to N) and the zero-cell handling
  * (the full grid contributes every cell's expectation).
  */
class Chi2Spec extends SparkSpec {

  test("chi2 and Cramér's V recount serially") {
    val dir = sf("sf0.001")
    val rows = spark.read.parquet(dir + "/orders.parquet")
      .selectExpr("o_orderpriority AS g", "o_orderstatus AS h").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val n = rows.length.toLong
    val cells = rows.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val gs = rows.map(_._1).distinct.sorted
    val hs = rows.map(_._2).distinct.sorted
    val rm = rows.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val cm = rows.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    // the operator's exact fold: per-cell term micro-floored, then summed
    val chi6 = (for (g <- gs; h <- hs) yield {
      val o = cells.getOrElse((g, h), 0L)
      val d = o.toDouble * n - rm(g).toDouble * cm(h)
      math.floor(d * d / (n.toDouble * rm(g) * cm(h)) * 1e6).toLong
    }).sum
    val wantChi2 = BigDecimal(chi6 / 1e6)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val row = Relational.statChi2(spark, dir).head()
    assert(row.getLong(0) == gs.length.toLong) // k_rows
    assert(row.getLong(1) == hs.length.toLong) // k_cols
    assert(row.getLong(2) == n)
    assert(row.getLong(3) == (gs.length - 1L) * (hs.length - 1L)) // dof
    assert(row.getDouble(4) == wantChi2, s"chi2 ${row.getDouble(4)}")
    assert(row.getDouble(4) >= 0d)
    val v = row.getDouble(5)
    assert(v >= 0d && v <= 1d, s"Cramér's V out of range: $v")
  }
}
