package graft.operators

import graft.SparkSpec

/** stat_mann_whitney: serial midrank recount plus a hand-computed tied
  * example (the law: 2·U₁ from the cum-window form equals the textbook
  * rank-sum with midranks, and U₁ + U₂ = n₁·n₂ always).
  */
class MannWhitneySpec extends SparkSpec {

  test("2*U1 matches a serial midrank recount; U1+U2 = n1*n2") {
    val dir = sf("sf0.001")
    import spark.implicits._
    val rows = spark.read.parquet(s"$dir/orders.parquet")
      .join(spark.read.parquet(s"$dir/customer.parquet"),
        $"o_custkey" === $"c_custkey")
      .selectExpr("c_mktsegment AS seg",
        "CAST(round(o_totalprice * 100) AS LONG) AS v",
        "CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END AS hi")
      .as[(String, Long, Int)].collect()
    val want = rows.groupBy(_._1).map { case (seg, xs) =>
      val sorted = xs.map(x => (x._2, x._3)).sortBy(_._1)
      // doubled midranks: a tied block [i, j] (1-based) has 2*mid = i + j
      val byVal = sorted.groupBy(_._1).toSeq.sortBy(_._1)
      var pos = 0L
      var r1x2 = 0L
      var tie = 0L
      byVal.foreach { case (_, block) =>
        val t = block.length.toLong
        val mid2 = (pos + 1) + (pos + t) // first rank + last rank
        r1x2 += block.count(_._2 == 1) * mid2
        tie += t * t * t - t
        pos += t
      }
      val n1 = sorted.count(_._2 == 1).toLong
      val n2 = sorted.length - n1
      seg -> ((n1, n2, r1x2 - n1 * (n1 + 1), tie))
    }
    val got = Relational.statMannWhitney(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got.length == want.size)
    got.foreach { case (seg, n1, n2, u1x2, tieTerm, rbPm) =>
      val (wn1, wn2, wu1x2, wtie) = want(seg)
      assert((n1, n2, u1x2, tieTerm) == ((wn1, wn2, wu1x2, wtie)),
        s"segment $seg")
      // U1 + U2 = n1*n2 (doubled: u1_x2 + u2_x2 = 2*n1*n2) pins the
      // rank-sum identity; rb_pm is its floored-permille readout
      assert(rbPm == 1000L - (1000L * u1x2) / (n1 * n2))
      assert(u1x2 >= 0L && u1x2 <= 2L * n1 * n2)
    }
  }

  test("hand-computed tied example") {
    import spark.implicits._
    // group hi: {10, 20, 20}; group lo: {20, 30}
    // sorted: 10(r1) 20 20 20 (ranks 2,3,4 -> mid 3) 30(r5)
    // R1 = 1 + 3 + 3 = 7 -> U1 = 7 - 3*4/2 = 1; U2 = n1*n2 - U1 = 5
    val work = java.nio.file.Files.createTempDirectory("mw").toString
    Seq((1L, "A", 10.0, "1-URGENT"), (2L, "A", 20.0, "2-HIGH"),
      (3L, "A", 20.0, "1-URGENT"), (4L, "A", 20.0, "5-LOW"),
      (5L, "A", 30.0, "5-LOW"))
      .toDF("o_custkey", "seg", "o_totalprice", "o_orderpriority")
      .selectExpr("o_custkey", "o_totalprice", "o_orderpriority",
        "o_custkey AS k")
      .write.mode("overwrite").parquet(s"$work/orders.parquet")
    Seq((1L, "SEG"), (2L, "SEG"), (3L, "SEG"), (4L, "SEG"), (5L, "SEG"))
      .toDF("c_custkey", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$work/customer.parquet")
    val got = Relational.statMannWhitney(spark, work)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got.length == 1)
    val (_, n1, n2, u1x2, tie, rb) = got.head
    assert((n1, n2) == ((3L, 2L)))
    assert(u1x2 == 2L, s"2*U1 = $u1x2, want 2 (U1 = 1)")
    assert(tie == (3L * 3 * 3 - 3)) // one tied block of 3
    assert(rb == 1000L - 2000L / 6L) // 1 - 2*1/(3*2) = 2/3 -> 667
  }
}
