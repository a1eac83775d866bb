package graft.operators

import graft.SparkSpec

/** stat_perm_test: serial recount of the deterministic permutation
  * battery (gate corpus + an engineered extreme-separation fixture).
  */
class PermTestSpec extends SparkSpec {

  private def serial(users: Seq[(Long, Long)], k: Int = 200)
      : (Long, Long, Long) = {
    def arms(lab: Long => Boolean) = {
      val (t, c) = users.partition(x => lab(x._1))
      (t.size.toLong, t.map(_._2).sum, c.size.toLong, c.map(_._2).sum)
    }
    val (n1, y1, n0, y0) = arms(_ % 2 == 0)
    val aObs = BigInt((y1 * n0 - y0 * n1).abs)
    val bObs = BigInt(n1 * n0)
    val cnt = (1 to k).count { kk =>
      val (pn1, py1, pn0, py0) = arms(u =>
        ((u * 2654435761L + kk * 40503L) % 1000000007L) % 2 == 1)
      BigInt((py1 * pn0 - py0 * pn1).abs) * bObs >=
        aObs * BigInt(pn1 * pn0)
    }.toLong
    (cnt, 1000L * (cnt + 1) / (k + 1), n1)
  }

  test("matches a serial recount on the gate corpus") {
    val dir = sf("sf0.001")
    import spark.implicits._
    val users = spark.read.parquet(s"$dir/events.parquet")
      .selectExpr("user_id", "CAST(round(value * 100) AS LONG) AS v")
      .as[(Long, Long)].collect()
      .groupBy(_._1).map { case (u, xs) => (u, xs.map(_._2).sum) }
      .toSeq
    val (wantCnt, wantP, wantN1) = serial(users)
    val got = Events.permTest(spark, dir)
      .as[(Long, Long, Long, Double, Long, Long, Long)].collect().head
    assert(got._1 == users.size)
    assert(got._2 == wantN1)
    assert((got._6, got._7) == ((wantCnt, wantP)),
      s"cnt/p ${(got._6, got._7)} vs serial ${(wantCnt, wantP)}")
  }

  test("engineered extreme separation yields a small p") {
    import spark.implicits._
    // 40 users: even users spend 1000, odd users spend 1 — the observed
    // parity split is (near) the most extreme labeling, so few of the
    // 200 hash relabelings can match it and p lands near the 1/(K+1)
    // floor. The exact count is pinned by the serial replay.
    val users = (0L until 40L).map(u =>
      (u, if (u % 2 == 0) 100000L else 100L))
    val work = java.nio.file.Files.createTempDirectory("perm").toString
    users.zipWithIndex.map { case ((u, cents), i) =>
      (i.toLong, java.sql.Timestamp.valueOf("2024-01-10 12:00:00"),
        u, "buy", cents / 100.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$work/events.parquet")
    val (wantCnt, wantP, _) = serial(users)
    val got = Events.permTest(spark, work)
      .as[(Long, Long, Long, Double, Long, Long, Long)].collect().head
    assert((got._6, got._7) == ((wantCnt, wantP)))
    assert(got._7 <= 50L, s"p_pm ${got._7} not small under extreme separation")
    assert(got._4 == 999.0) // (1000.00 - 1.00) dollars
  }
}
