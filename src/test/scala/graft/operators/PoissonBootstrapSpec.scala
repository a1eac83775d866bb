package graft.operators

import graft.SparkSpec

/** poissonBootstrap: the deterministic-weight laws — every replica's
  * effective count and weighted mean recount from the published
  * inverse-CDF transform, replica sizes concentrate near n (sum of n
  * Poisson(1) draws), and the replicas actually differ (the spread IS
  * the estimator's purpose).
  */
class PoissonBootstrapSpec extends SparkSpec {

  private val M = 2147483647L
  private val thresholds = Seq(790015083L, 1580030167L, 1975037709L,
    2106706890L, 2139624185L, 2146207644L, 2147304887L, 2147461637L)

  test("replica counts and means recount from the inverse-CDF weights") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue))
    val got = TextOps.poissonBootstrap(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSeq == (0L to 7L))
    got.foreach { case (rep, nEff, mean) =>
      val ks = docs.map { case (id, nc) =>
        val h1 = (2654435761L * (id * 8L + rep) + 12007L) % M
        val y = h1 ^ (h1 >> 15)
        val h2 = (1779033703L * y + 514229L) % M
        val u = h2 ^ (h2 >> 13)
        (thresholds.count(u >= _).toLong, nc)
      }
      assert(nEff == ks.map(_._1).sum, s"replica $rep n_eff")
      assert(mean == ks.map { case (k, nc) => k * nc }.sum / ks.map(_._1).sum,
        s"replica $rep mean")
    }
  }

  test("replica sizes concentrate near n and replicas differ") {
    val n = spark.read.parquet(sf("sf0.001") + "/documents.parquet").count()
    val got = TextOps.poissonBootstrap(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    got.foreach { case (nEff, _) =>
      // sum of n Poisson(1) has sd sqrt(n): 5 sigma at n=500 is ~112
      assert(math.abs(nEff - n) <= 5 * math.sqrt(n.toDouble),
        s"replica size $nEff implausible for n=$n")
    }
    assert(got.map(_._1).distinct.length > 1, "replica sizes all equal")
    assert(got.map(_._2).distinct.length > 1,
      "replica means all equal — no spread to read uncertainty from")
  }
}
