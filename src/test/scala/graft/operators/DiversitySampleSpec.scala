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

  test("a corpus with fewer distinct vectors than k yields distinct " +
      "centers and stops short, never re-selecting a chosen one") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 3 distinct points, each duplicated twice → 6 rows, k=5 requested.
    // Once the 3 distinct points are chosen the covering radius is 0;
    // the anti-join must stop the traversal rather than let the vec_id
    // tie-break re-emit vec 0 (the pre-fix behavior).
    val embQ = Seq(
      (0L, Seq(0L, 0L)), (1L, Seq(0L, 0L)),
      (2L, Seq(10L, 0L)), (3L, Seq(10L, 0L)),
      (4L, Seq(0L, 10L)), (5L, Seq(0L, 10L))
    ).toDF("vec_id", "q")
      .withColumn("n2",
        aggregate($"q", lit(0L), (acc, x) => acc + x * x))
    val got = Similarity.diversitySampleOf(embQ, k = 5).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    // seed 0, then farthest distinct points: 2 or 4 (d2=100 each, id
    // tie-break → 2), then 4 (d2 to nearest chosen = 100), then the only
    // remaining distinct geometry is covered — duplicates 1,3,5 have
    // md2=0 and MUST NOT appear; traversal stops at 3 centers.
    assert(got.toSeq == Seq((0, 0L, 0L), (1, 2L, 100L), (2, 4L, 100L)))
  }
}
