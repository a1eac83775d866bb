package graft.operators

import graft.SparkSpec

/** lshTuning: the banding S-curve laws — finer bands are supersets (so
  * candidate and true-pair counts are nondecreasing down the table), and
  * the shipped (2 bands × 4 rows) row must agree exactly with the
  * production shinglePairs candidate set.
  */
class LshTuningSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("banding configs are nested and the shipped config row matches " +
      "shinglePairs") {
    val rows = TextOps.lshTuning(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.map(r => (r._1, r._2)).toSeq ==
      Seq((2L, 4L), (4L, 2L), (8L, 1L)))
    // an r-row band match implies all its sub-band matches: candidates
    // are supersets down the table, so both counts are nondecreasing
    assert(rows.map(_._3).toSeq == rows.map(_._3).toSeq.sorted)
    assert(rows.map(_._4).toSeq == rows.map(_._4).toSeq.sorted)
    rows.foreach { case (_, _, cand, tru, pm) =>
      assert(tru <= cand)
      assert(pm == 1000L * tru / math.max(cand, 1L))
    }
    // the (2, 4) config IS the production shingle banding
    val shipped = TextOps.shinglePairs(spark, dir).count()
    assert(rows.head._3 == shipped)
  }
}
