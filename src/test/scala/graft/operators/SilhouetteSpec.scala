package graft.operators

import graft.SparkSpec

/** sim_silhouette: serial recount of the simplified-silhouette fold from
  * the same quantized vectors and fitted centroids (exact int64 squared
  * distances, one IEEE sqrt/division per vector), plus the structural
  * laws: with nearest-centroid assignment every per-vector score is
  * nonnegative, and cell populations must equal the IVF assignment's.
  */
class SilhouetteSpec extends SparkSpec {

  test("per-cell means match a serial recount; s >= 0 by construction") {
    val dir = sf("sf0.001")
    import spark.implicits._
    val emb = Similarity.qEmb(spark, dir)
    val vecs = emb.select("vec_id", "q").as[(Long, Seq[Long])].collect()
    val cents = Similarity.ivfCentroids(spark, emb, 8)
      .as[(Long, Seq[Long])].collect()

    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

    val per = vecs.map { case (v, q) =>
      val ds = cents.map { case (cid, cq) => (d2(q, cq), cid) }
      val pack = ds.map { case (d, c) => d * 8 + c }.min
      val (own, a2) = (pack % 8, pack / 8)
      val b2 = ds.filter(_._2 != own).map(_._1).min
      val spm = math.floor(1000d * (math.sqrt(b2.toDouble)
        - math.sqrt(a2.toDouble))
        / math.sqrt(math.max(math.max(a2, b2), 1L).toDouble)).toLong
      assert(spm >= 0L, s"vec $v silhouette $spm < 0")
      (own, spm)
    }
    val want = per.groupBy(_._1).map { case (c, xs) =>
      val s = xs.map(_._2).sum
      (c, xs.length.toLong, math.floorDiv(s, xs.length.toLong))
    }.toSeq.sortBy(_._1)

    val got = Similarity.simSilhouette(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == want)
    // populations cover the corpus exactly once
    assert(got.map(_._2).sum == vecs.length.toLong)
  }
}
