package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Approximate aggregates (HLL count-distinct, quantile sketches): engine
  * capability checked against exact answers with the documented error
  * bounds — sketch internals differ across engines, so these are
  * tolerance tests, not oracle queries.
  */
class ApproxAggSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact on every column tried") {
    val li = Tables.lineitem(spark, sf("sf0.01"))
    for (c <- Seq("l_orderkey", "l_partkey", "l_suppkey")) {
      val exact = li.select(col(c)).distinct().count().toDouble
      val approx = li.agg(approx_count_distinct(col(c)).as("a"))
        .collect()(0).getLong(0).toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"$c: approx=$approx exact=$exact")
    }
  }

  test("deterministic HLL equals an in-memory register replay and tracks exact counts") {
    val rows = Tables.lineitem(spark, sf("sf0.01"))
      .selectExpr("l_returnflag", "cast(l_partkey as long)").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val M = 2147483647L
    val ref = rows.groupBy(_._1).map { case (g, rs) =>
      val regs = new Array[Int](64)
      rs.foreach { case (_, k) =>
        val x1 = (2654435761L * k + 12007L) % M
        val y1 = x1 ^ (x1 >> 15)
        val x2 = (1779033703L * y1 + 514229L) % M
        val hv = x2 ^ (x2 >> 13)
        val w = hv / 64
        val rho = if (w == 0L) 26 else 26 - (64 - java.lang.Long.numberOfLeadingZeros(w))
        val j = (hv % 64).toInt
        if (rho > regs(j)) regs(j) = rho
      }
      val ssum = regs.map(r => math.pow(2.0, -r)).sum
      g -> ((math.floor(0.709 * 4096.0 / ssum).toLong, regs.count(_ == 0).toLong))
    }
    val got = graft.operators.Sketches.hllDistinct(spark, sf("sf0.01")).collect()
    assert(got.length == ref.size)
    got.foreach { r =>
      val (est, nZero) = ref(r.getString(0))
      assert(r.getLong(1) == nZero, s"${r.getString(0)}: n_zero")
      assert(r.getLong(2) == est, s"${r.getString(0)}: estimate")
      val exact = r.getLong(3).toDouble
      // m=64 -> ~13% standard error; 3 sigma guard against a broken hash
      assert(math.abs(r.getLong(2) - exact) / exact < 0.4,
        s"${r.getString(0)}: est=${r.getLong(2)} exact=$exact")
    }
  }

  test("approx percentile brackets the exact median") {
    val ord = Tables.orders(spark, sf("sf0.01"))
    val apx = ord.agg(
      percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)).as("m"))
      .collect()(0).getDouble(0)
    val sorted = ord.select(col("o_totalprice")).collect()
      .map(_.getDouble(0)).sorted
    val lo = sorted((sorted.length * 0.49).toInt)
    val hi = sorted((sorted.length * 0.51).toInt)
    assert(apx >= lo && apx <= hi, s"median approx $apx outside [$lo, $hi]")
  }
}
