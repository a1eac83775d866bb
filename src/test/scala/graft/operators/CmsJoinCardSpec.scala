package graft.operators

import graft.SparkSpec

/** sketch_cms_join_card: both sketch-row inner products recount from a
  * serial rebuild of the d=2 × w=8192 counter table with the same hash,
  * and the estimate is ONE-SIDED — est ≥ exact always (collisions only
  * merge buckets, and (a+b)² ≥ a² + b² for non-negative counts).
  */
class CmsJoinCardSpec extends SparkSpec {

  private val M = 2147483647L

  test("inner products recount from a serial sketch rebuild") {
    val dir = sf("sf0.001")
    val keys = spark.read.parquet(dir + "/lineitem.parquet")
      .selectExpr("l_partkey").collect().map(_.getLong(0))
    def row(a: Long, b: Long, c: Long, d: Long): Long = {
      def bucket(k: Long): Long = {
        val x = (a * k + b) % M
        val y = x ^ (x >> 15)
        val z = (c * y + d) % M
        (z ^ (z >> 13)) % 8192L
      }
      val cells = keys.groupBy(bucket)
        .map { case (_, g) => BigInt(g.length) }
      cells.map(cc => cc * cc).sum.toLong
    }
    val est0 = row(2654435761L, 12007L, 1779033703L, 514229L)
    val est1 = row(52361L, 33023L, 2246822519L, 28657L)
    val exact = keys.groupBy(identity)
      .map { case (_, g) => BigInt(g.length) }.map(c => c * c).sum.toLong
    val got = Sketches.cmsJoinCard(spark, dir).collect().head
    assert(got.getLong(0) == est0, "est_row0")
    assert(got.getLong(1) == est1, "est_row1")
    assert(got.getLong(2) == math.min(est0, est1), "est_join = min row")
    assert(got.getLong(3) == exact, "exact_join")
    assert(got.getLong(4) == 1000L * (got.getLong(2) - exact) / exact,
      "overest_pm")
  }

  test("the estimate is one-sided: never below the exact join size") {
    for (d <- Seq("sf0.001", "sf0.01")) {
      val got = Sketches.cmsJoinCard(spark, sf(d)).collect().head
      assert(got.getLong(0) >= got.getLong(3), s"$d row0 one-sided")
      assert(got.getLong(1) >= got.getLong(3), s"$d row1 one-sided")
      assert(got.getLong(4) >= 0L, s"$d overest_pm non-negative")
    }
  }
}
