package graft.operators

import graft.SparkSpec
import graft.sources.Tables

/** diversitySample: certified by an in-memory greedy recompute plus the
  * covering-radius monotonicity law of farthest-point traversal.
  */
class DiversitySampleSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("k-center greedy matches an in-memory recompute; the covering " +
      "radius never grows") {
    import spark.implicits._
    val got = Similarity.diversitySample(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))

    val vecs = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 10000d).toLong))
      .toMap
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var chosen = Vector((0, 0L, 0L))
    for (i <- 1 until 10) {
      val (best, bd2) = vecs.toSeq.map { case (id, v) =>
        (id, chosen.map(c => d2(v, vecs(c._2))).min)
      }.minBy { case (id, md2) => (-md2, id) }
      chosen = chosen :+ ((i, best, bd2))
    }
    assert(got.toSeq == chosen)

    // selections are distinct and the covering radius is non-increasing
    assert(got.map(_._2).distinct.length == got.length)
    val radii = got.drop(1).map(_._3)
    assert(radii.zip(radii.drop(1)).forall { case (a, b) => b <= a },
      "covering radius grew between greedy steps")
    assert(radii.head > 0, "second pick coincides with the seed")
  }
}
