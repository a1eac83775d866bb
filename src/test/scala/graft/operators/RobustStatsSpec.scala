package graft.operators

import java.nio.file.Files

import graft.SparkSpec

/** statWinsorize / statEquidepthHist / changepoint: exact recounts of the
  * order statistics and the CUSUM argmax, plus the shape laws a consumer
  * relies on (ANSI ntile depths, clip bounds, known-shift detection).
  */
class RobustStatsSpec extends SparkSpec {

  test("winsorize: bounds are the exact P5/P95 and means recount") {
    val vals = spark.read.parquet(sf("sf0.001") + "/orders.parquet")
      .select("o_orderpriority", "o_totalprice", "o_orderkey").collect()
      .map(r => (r.getString(0), math.rint(r.getDouble(1) * 100).toLong,
        r.getLong(2)))
    val sorted = vals.sortBy(v => (v._2, v._3)).map(_._2)
    val n = sorted.length.toLong
    def at(pm: Long) = sorted((math.max(1L, (pm * n + 999L) / 1000L) - 1L).toInt)
    val (lo, hi) = (at(50L), at(950L))
    val got = Relational.statWinsorize(spark, sf("sf0.001")).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(2) == lo && r.getLong(3) == hi, "clip bounds")
      val grp = vals.filter(_._1 == r.getString(0)).map(_._2)
      assert(r.getLong(1) == grp.length.toLong)
      assert(r.getLong(4) == grp.sum / grp.length)
      val w = grp.map(v => math.min(hi, math.max(lo, v)))
      assert(r.getLong(5) == w.sum / w.length, s"${r.getString(0)}: wins mean")
      assert(r.getLong(5) >= lo && r.getLong(5) <= hi)
    }
  }

  test("equi-depth: ANSI ntile depths, ordered non-overlapping bounds") {
    val rows = Relational.statEquidepthHist(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == (1L to 16L))
    val n = rows.map(_._2).sum
    val (q, rem) = (n / 16, n % 16)
    rows.foreach { case (b, cnt, lo, hi) =>
      assert(cnt == (if (b <= rem) q + 1 else q), s"bucket $b depth")
      assert(lo <= hi)
    }
    rows.sliding(2).foreach {
      case Array((_, _, _, hi0), (_, _, lo1, _)) => assert(hi0 <= lo1)
      case _ =>
    }
  }

  test("changepoint: CUSUM recount on the corpus") {
    val daily = spark.read.parquet(sf("sf0.001") + "/events.parquet")
      .collect().map { r =>
        (r.getString(3), r.getAs[java.time.LocalDateTime](1).toLocalDate)
      }.groupBy(identity).map { case ((t, d), es) =>
        (t, d.toString, es.length.toLong) }.toSeq
    val got = Events.changepoint(spark, sf("sf0.001")).collect()
      .map(r => r.getString(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    daily.groupBy(_._1).foreach { case (tpe, rs) =>
      val series = rs.sortBy(_._2).map(r => (r._2, r._3))
      val (days, total) = (series.length.toLong, series.map(_._2).sum)
      var acc = 0L
      val devs = series.zipWithIndex.map { case ((day, x), i) =>
        acc += x
        (day, days * acc - (i + 1L) * total)
      }
      val best = devs.maxBy { case (day, dv) => (math.abs(dv), dv, day) }
      val (gDay, gAbs, gDays, gTotal) = got(tpe)
      assert((gDay, gAbs) == (best._1, math.abs(best._2)), s"type $tpe")
      assert(gDays == days && gTotal == total)
    }
  }

  test("changepoint: a planted level shift is found at its boundary") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-cp").toFile.getAbsolutePath
    val rows = for {
      day <- 1 to 20
      i <- 1 to (if (day <= 10) 3 else 30)
    } yield (day.toLong * 1000 + i,
      java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00"),
      1L, "spike", 1.0, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = Events.changepoint(spark, dir).collect()
    assert(got.length == 1)
    assert(got.head.getString(1) == "2024-01-10",
      "CUSUM must peak at the last day of the low regime")
  }
}
