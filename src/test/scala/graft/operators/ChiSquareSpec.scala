package graft.operators

import graft.SparkSpec

/** chiSquare: cells recount from a serial contingency build; margins
  * conserve the joined row count; the chi-square contributions follow
  * the floored-expectation formula exactly.
  */
class ChiSquareSpec extends SparkSpec {

  test("contingency cells and chi-square contributions recount serially") {
    val dir = sf("sf0.001")
    val ords = spark.read.parquet(dir + "/orders.parquet")
      .selectExpr("o_custkey", "o_orderpriority AS p").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val segByCust = spark.read.parquet(dir + "/customer.parquet")
      .selectExpr("c_custkey", "c_mktsegment AS g").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val joined = ords.flatMap { case (ck, p) =>
      segByCust.get(ck).map(g => (g, p))
    }
    val cells = joined.groupBy(identity).map { case (k, v) =>
      k -> v.length.toLong
    }
    val rMarg = cells.groupBy(_._1._1).map { case (g, m) => g -> m.values.sum }
    val cMarg = cells.groupBy(_._1._2).map { case (p, m) => p -> m.values.sum }
    val n = cells.values.sum

    val got = Quality.chiSquare(spark, dir).collect()
    assert(got.length == cells.size)
    var totalO = 0L
    got.foreach { r =>
      val (g, p) = (r.getString(0), r.getString(1))
      val o = r.getLong(2)
      assert(o == cells((g, p)), s"cell ($g,$p) count")
      val e = rMarg(g) * cMarg(p) / n
      assert(r.getLong(3) == e, s"cell ($g,$p) e_floor")
      val d = o - e
      assert(r.getLong(4) == 1000L * d * d / math.max(1L, e),
        s"cell ($g,$p) chi2 contribution")
      totalO += o
    }
    assert(totalO == n, "cells conserve the joined row count")
  }
}
