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
