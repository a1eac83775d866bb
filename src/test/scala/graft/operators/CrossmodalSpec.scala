package graft.operators

import graft.SparkSpec

/** crossmodalDups: pair set = the shingle-LSH candidates; hamming agrees
  * with the published per-media phash; the xmodal flag is the ≤2 rule.
  */
class CrossmodalSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("crossmodal pairs recompute from shinglePairs × mediaPHash") {
    val ph = Multimodal.mediaPHash(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = TextOps.shinglePairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expect = pairs.map { case (a, b) =>
      val h = java.lang.Long.bitCount(ph(a) ^ ph(b)).toLong
      (a, b) -> ((h, if (h <= 2) 1L else 0L))
    }.toMap
    val got = Multimodal.crossmodalDups(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == expect)
    assert(got.nonEmpty)
  }
}
