package graft.operators

import graft.SparkSpec

/** statGini: the rank-identity output recounts serially AND agrees with
  * the O(n²) mean-absolute-difference definition — two independent
  * formulas, one number; plus the [0, 1000) bound.
  */
class GiniSpec extends SparkSpec {

  test("rank identity matches the mean-absolute-difference definition") {
    val dir = sf("sf0.001")
    val xs = spark.read.parquet(dir + "/orders.parquet")
      .groupBy("o_custkey")
      .agg(org.apache.spark.sql.functions.expr(
        "CAST(round(sum(o_totalprice)) AS LONG)").as("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = xs.length.toLong
    val sorted = xs.sortBy { case (k, x) => (x, k) }.map(_._2)
    val sx = BigInt(sorted.map(BigInt(_)).sum.toString)
    val six = sorted.zipWithIndex
      .map { case (x, i) => BigInt(i + 1) * x }.sum
    val num = 2 * six - BigInt(n + 1) * sx
    val den = BigInt(n) * sx
    // independent O(n^2) definition: sum of |xi - xj| over ordered pairs
    val mad = (for (a <- sorted; b <- sorted) yield BigInt((a - b).abs)).sum
    assert(num * 2 == mad, "rank identity == mean absolute difference")

    val got = Relational.statGini(spark, dir).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(0) == n)
    assert(BigInt(r.getLong(1)) == sx)
    assert(BigInt(r.getLong(2)) == num, "num")
    assert(BigInt(r.getLong(3)) == den, "den")
    assert(r.getLong(4) == (num * 1000 / den).toLong, "gini_pm")
    assert(r.getLong(4) >= 0 && r.getLong(4) < 1000, "0 <= G < 1")
  }
}
