package graft.operators

import graft.SparkSpec

/** sketch_quantile: the fixed-grid mergeable quantile sketch's two laws.
  *
  *  1. DETERMINISTIC error bound — for every target per-mille pm the
  *     estimate brackets the exact order statistic computed by a serial
  *     sort: exact ≤ est_cents AND est_cents − exact ≤ width. This is
  *     the sketch's contract (a grid-width bound, not probabilistic).
  *  2. MERGEABILITY — the histogram of a union equals the per-bucket sum
  *     of the shards' histograms, so the whole-corpus readout computed
  *     from merged shard sketches is IDENTICAL to the single-pass one
  *     (the property that lets 1000 executors sketch independently).
  */
class QuantileSketchSpec extends SparkSpec {

  private val width = 8192L

  test("estimate brackets the exact order statistic within one grid width") {
    val dir = sf("sf0.001")
    import spark.implicits._
    val cents = spark.read.parquet(s"$dir/lineitem.parquet")
      .selectExpr("CAST(round(l_extendedprice * 100) AS LONG) AS c")
      .as[Long].collect().sorted
    val n = cents.length.toLong
    val got = Sketches.quantileSketch(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.map(_._1).toSeq == Seq(250L, 500L, 750L, 900L, 990L))
    got.foreach { case (pm, bucket, est, gotN) =>
      assert(gotN == n)
      // exact order statistic at rank ceil(pm*n/1000) (1-based)
      val rank = ((pm * n + 999L) / 1000L).toInt
      val exact = cents(rank - 1)
      assert(exact <= est, s"pm=$pm: exact $exact > est $est")
      assert(est - exact <= width,
        s"pm=$pm: est $est overshoots exact $exact by more than $width")
      assert(bucket == exact / width || (bucket + 1L) * width >= exact)
    }
  }

  test("shard histograms merge to the single-pass sketch (mergeability)") {
    val dir = sf("sf0.001")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(round(col("l_extendedprice") * 100).cast("long").as("cents"),
        (col("l_orderkey") % 2L).as("shard"))
    // per-shard sketches built independently, then merged by bucket sum
    val shardHistos = li
      .groupBy(col("shard"), expr(s"cents div $width").as("b"))
      .agg(count(lit(1)).as("cnt"))
    val merged = shardHistos.groupBy(col("b"))
      .agg(sum(col("cnt")).as("cnt"))
      .as[(Long, Long)].collect().toMap
    val direct = li.groupBy(expr(s"cents div $width").as("b"))
      .agg(count(lit(1)).as("cnt"))
      .as[(Long, Long)].collect().toMap
    assert(merged == direct)
  }
}
