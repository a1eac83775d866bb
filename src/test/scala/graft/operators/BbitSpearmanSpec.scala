package graft.operators

import graft.SparkSpec

/** bbitPairs / sqSpearman: estimator laws against the exact columns they
  * carry, plus consistency with the frames they derive from.
  */
class BbitSpearmanSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("bbitPairs: collision count bounds, debias formula, and the " +
      "estimator brackets exact Jaccard on identical pairs") {
    val rows = TextOps.bbitPairs(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4))))
    assert(rows.nonEmpty)
    // pair set = the shingle-LSH candidates
    val cand = TextOps.shinglePairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.map(_._1).toSet == cand)
    rows.foreach { case (_, (c, est, jac)) =>
      assert(c >= 0L && c <= 8L)
      assert(est == math.max((2 * c - 8) * 125, 0L))
      assert(jac >= 0.0 && jac <= 1.0)
      // an identical pair (J = 1) must collide on every bit
      if (jac == 1.0) assert(c == 8L && est == 1000L)
    }
  }

  test("sqSpearman: rho in range, n covers the corpus, and high rank " +
      "agreement for the SQ8 quantizer") {
    import spark.implicits._
    val n = graft.sources.Tables.embeddings(spark, dir).count() - 1
    val rows = Similarity.sqSpearman(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == (0L until 10L).toSeq)
    rows.foreach { case (_, nn, d2, rho) =>
      assert(nn == n)
      val nt = nn * (nn * nn - 1L)
      assert(rho == (1000L * nt - 6000L * d2) / nt)
      assert(rho >= -1000L && rho <= 1000L)
      // SQ8 at 1e-4 quantization barely perturbs the ordering
      assert(rho >= 900L)
    }
  }
}
