package graft.operators

import graft.SparkSpec

/** stat_anova: the two-level fold recounts from a serial per-group
  * computation, and the decomposition law SSB + SSW = SST holds to
  * rounding.
  */
class AnovaSpec extends SparkSpec {

  private def round(x: Double, s: Int): Double =
    BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("fold equals the serial per-group recount") {
    import spark.implicits._
    val dir = sf("sf0.001")
    val rows = spark.read.parquet(dir + "/orders.parquet")
      .selectExpr("o_orderpriority", "round(o_totalprice)::LONG AS v")
      .as[(String, Long)].collect()
    val groups = rows.groupBy(_._1).values.toSeq
    val k = groups.length.toLong
    val nTotal = rows.length.toLong
    val sTotal = rows.map(_._2).sum
    val qTotal = rows.map(r => (r._2.toDouble) * r._2).sum
    // mirror the operator's centi-floored decimal fold exactly
    val tSum = groups.map { g =>
      val s = g.map(_._2).sum
      BigDecimal(math.floor(s.toDouble * s / g.length * 100d))
    }.sum
    val sbPart = tSum.toDouble / 100d
    val ssb = sbPart - sTotal.toDouble * sTotal / nTotal
    val ssw = qTotal - sbPart
    val f = (ssb / (k - 1)) / (ssw / (nTotal - k))

    val r = Relational.statAnova(spark, dir).collect().head
    assert(r.getLong(0) == k && r.getLong(1) == nTotal)
    assert(r.getDouble(2) == round(ssb, 2), "ss_between")
    assert(r.getDouble(3) == round(ssw, 2), "ss_within")
    assert(r.getDouble(4) == round(f, 4), "f")
  }

  test("decomposition and positivity laws") {
    import spark.implicits._
    val dir = sf("sf0.001")
    val r = Relational.statAnova(spark, dir).collect().head
    assert(r.getLong(0) == 5L, "five order priorities")
    assert(r.getDouble(2) >= 0.0 && r.getDouble(3) > 0.0)
    assert(r.getDouble(4) >= 0.0)
    // SSB + SSW must equal the total sum of squares about the grand mean
    val rows = spark.read.parquet(dir + "/orders.parquet")
      .selectExpr("round(o_totalprice)::LONG AS v").as[Long].collect()
    val m = rows.sum.toDouble / rows.length
    val sst = rows.map(v => (v - m) * (v - m)).sum
    assert(math.abs(r.getDouble(2) + r.getDouble(3) - sst) < 1.0,
      s"SSB+SSW=${r.getDouble(2) + r.getDouble(3)} vs SST=$sst")
  }
}
