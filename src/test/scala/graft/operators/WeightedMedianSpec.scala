package graft.operators

import graft.SparkSpec

/** stat_weighted_median: the composite-order GlobalOrder form recounts
  * from a serial per-group weighted-median computation, and the defining
  * inequality pair holds — weight strictly below the median < half the
  * total, weight up to and including it ≥ half.
  */
class WeightedMedianSpec extends SparkSpec {

  private def collected(dir: String) =
    spark.read.parquet(dir + "/lineitem.parquet")
      .selectExpr("l_returnflag AS grp",
        "CAST(round(l_extendedprice) AS LONG) AS v",
        "CAST(l_quantity AS LONG) AS w")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

  test("per-group weighted median recounts serially") {
    val dir = sf("sf0.001")
    val rows = collected(dir)
    val want = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (g, rs) =>
      val hist = rs.groupBy(_._2).toSeq
        .map { case (v, g2) => (v, g2.map(_._3).sum) }.sortBy(_._1)
      val total = hist.map(_._2).sum
      var cum = 0L
      val med = hist.collectFirst {
        case (v, w) if { cum += w; 2 * cum >= total } => v
      }.get
      (g, total, med)
    }
    val got = Relational.statWeightedMedian(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == want)
  }

  test("the median splits the weight mass by the defining inequalities") {
    val dir = sf("sf0.001")
    val rows = collected(dir)
    val got = Relational.statWeightedMedian(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (g, total, med) = (r.getString(0), r.getLong(1), r.getLong(2))
      val below = rows.filter(t => t._1 == g && t._2 < med).map(_._3).sum
      val upto = rows.filter(t => t._1 == g && t._2 <= med).map(_._3).sum
      assert(2 * below < total, s"$g: strictly-below mass < half")
      assert(2 * upto >= total, s"$g: mass through median >= half")
    }
  }
}
