package graft.operators

import graft.SparkSpec

/** Two-phase skyline correctness: partitioning invariance and exact
  * agreement with a naive driver-side dominance check.
  */
class SkylineSpec extends SparkSpec {

  private def naive(rows: Seq[(Long, Double, Double)]) =
    rows.filterNot { a =>
      rows.exists(b => b != a &&
        b._2 >= a._2 && b._3 >= a._3 && (b._2 > a._2 || b._3 > a._3))
    }.map(_._1).toSet

  test("skyline equals naive dominance filter under any partitioning") {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    val rows = (1L to 300L).map(i =>
      (i, rng.nextInt(50).toDouble, rng.nextInt(50).toDouble))
    val want = naive(rows)
    for (parts <- Seq(1, 7)) {
      val df = rows.toDF("id", "x", "y").repartition(parts)
      val got = Skyline.skyline(df, Seq("x", "y"))
        .collect().map(_.getLong(0)).toSet
      assert(got == want, s"parts=$parts")
    }
  }

  test("duplicate points are all kept (no self-domination)") {
    import spark.implicits._
    val df = Seq((1L, 5.0, 5.0), (2L, 5.0, 5.0), (3L, 1.0, 1.0))
      .toDF("id", "x", "y")
    val got = Skyline.skyline(df, Seq("x", "y"))
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L))
  }
}
