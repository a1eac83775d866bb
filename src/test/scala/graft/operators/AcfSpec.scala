package graft.operators

import graft.SparkSpec

/** ev_acf: the bounded-fold autocorrelation recounts from a serial pass
  * over collected daily counts (BigInt sufficient statistics), and the
  * Cauchy–Schwarz band |r_k| ≤ 1 holds — the lag-pair sum runs over a
  * SUBSET of the terms the denominator sums, so |num_k| ≤ den exactly.
  */
class AcfSpec extends SparkSpec {

  test("lag-1..7 ACF recounts from a serial daily fold") {
    val dir = sf("sf0.001")
    val daily = spark.read.parquet(dir + "/events.parquet")
      .selectExpr(
        "CAST(datediff(date_trunc('day', ts), DATE '2024-01-01') AS LONG) AS t")
      .collect().map(_.getLong(0))
      .groupBy(identity).map { case (t, g) => t -> g.length.toLong }
    val n = BigInt(daily.size)
    val sx = daily.values.map(BigInt(_)).sum
    val dev = daily.map { case (t, x) => t -> (n * x - sx) }
    val den = dev.values.map(d => d * d).sum
    val want = (1L to 7L).map { k =>
      val num = dev.toSeq.flatMap { case (t, da) =>
        dev.get(t + k).map(db => da * db)
      }.sum
      val pm = num.signum * (num.abs * 1000 / den).toLong
      (k, num, den, pm)
    }
    val got = Events.acf(spark, dir).collect()
      .map(r => (r.getLong(0), BigInt(r.getLong(1)), BigInt(r.getLong(2)),
        r.getLong(3)))
    assert(got.toSeq == want)
  }

  test("every lag stays inside the Cauchy-Schwarz permille band") {
    val got = Events.acf(spark, sf("sf0.001")).collect()
    assert(got.length == 7)
    got.foreach { r =>
      assert(r.getLong(2) > 0, "den positive")
      assert(math.abs(r.getLong(1)) <= r.getLong(2), "|num| <= den")
      assert(math.abs(r.getLong(3)) <= 1000L, "|acf_pm| <= 1000")
    }
  }
}
