package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Laws for the round-9 evaluation/monitoring operators: exact MIPS
  * ranking, integer-exact volume anomalies, and the language-ID confusion
  * matrix — each checked against an independent in-memory recompute.
  */
class EvalOpsSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("mipsTopK matches a brute-force in-memory inner-product ranking") {
    import spark.implicits._
    val got = Similarity.mipsTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val vecs = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 10000d).toLong))
      .toMap
    val expect = (for (q <- vecs.keys.filter(_ < 10)) yield {
      val qq = vecs(q)
      vecs.toSeq.filter(_._1 != q)
        .map { case (id, v) =>
          (id, v.zip(qq).map { case (a, b) => a * b }.sum) }
        .sortBy { case (id, dp) => (-dp, id) }
        .take(5).zipWithIndex
        .map { case ((id, dp), i) => (q, i + 1) -> ((id, dp)) }
    }).flatten.toMap
    assert(got == expect)
  }

  test("ev_anomaly flags exactly the >2-sigma days of an exact recompute") {
    import spark.implicits._
    val got = Events.anomalies(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getInt(3))))
      .toMap
    val days = Tables.events(spark, dir)
      .select($"event_type",
        date_format(date_trunc("day", $"ts"), "yyyy-MM-dd").as("day"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val counts = days.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val expect = counts.map { case ((t, day), n) =>
      val ns = counts.collect { case ((tt, _), m) if tt == t => m }.toSeq
      val (d, sn, ss) = (ns.length.toLong, ns.sum, ns.map(x => x * x).sum)
      val dev = n * d - sn
      (t, day) -> ((n, if (dev * dev > 4L * (d * ss - sn * sn)) 1 else 0))
    }
    assert(got == expect)
    // volume conservation: per type, the daily counts sum to the raw total
    val byType = days.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    got.groupBy(_._1._1).foreach { case (t, rows) =>
      assert(rows.values.map(_._1).sum == byType(t))
    }
  }

  test("langIdConfusion is the exact groupBy of the per-doc predictions") {
    import spark.implicits._
    val got = TextOps.langIdConfusion(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    val preds = TextOps.langId(spark, dir)
      .select($"lang", $"pred_lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expect = preds.groupBy(identity).map { case ((l, p), v) =>
      val n = v.length.toLong
      val tot = preds.count(_._1 == l).toLong
      (l, p) -> ((n, n * 1000 / tot))
    }
    assert(got == expect)
    // conservation: matrix cells sum to the corpus size
    assert(got.values.map(_._1).sum ==
      Tables.documents(spark, dir).count())
  }

  test("MAD outliers: exact order-statistic recount of the Hampel rule") {
    import spark.implicits._
    val r = Relational.statMadOutliers(spark, dir).head()
    val cents = Tables.orders(spark, dir)
      .select(round($"o_totalprice" * 100).cast("long")).as[Long]
      .collect().sorted
    val n = cents.length.toLong
    val pos = (math.max(1L, (500L * n + 999L) / 1000L) - 1L).toInt
    val m = cents(pos)
    val mad = cents.map(v => math.abs(v - m)).sorted.apply(pos)
    val out = cents.count(v => math.abs(v - m) * 10000L > 44478L * mad)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      === ((n, m, mad, out.toLong)))
    // robustness sanity: median/MAD are unmoved by corrupting the top
    // value to 100x (the mean/sigma rule's failure case)
    val corrupt = (cents.dropRight(1) :+ cents.last * 100L).sorted
    assert(corrupt(pos) === m)
    assert(corrupt.map(v => math.abs(v - m)).sorted.apply(pos) === mad)
  }

  test("knnClassify matches a brute-force in-memory vote recount") {
    import spark.implicits._
    val got = Similarity.knnClassify(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val vecs = Tables.embeddings(spark, dir)
      .select($"vec_id", $"label".cast("long"), $"embedding").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Float](2).map(x => math.floor(x.toDouble * 10000d).toLong)))
    val train = vecs.filter(_._1 >= 100L)
    val preds = vecs.filter(_._1 < 100L).map { case (_, tl, q) =>
      val nn = train
        .map { case (id, l, v) =>
          (id, l, v.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum) }
        .sortBy { case (id, _, d2) => (d2, id) }.take(5)
      val pred = nn.groupBy(_._2).view.mapValues(_.size).toSeq
        .sortBy { case (l, v) => (-v, l) }.head._1
      (tl, pred)
    }
    val expect = preds.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got === expect)
    assert(got.values.sum === 100L) // every eval vector classified once
  }

  test("calibration buckets: conservation, bounds, exact raw recount") {
    import spark.implicits._
    val got = TextOps.calibration(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
    val raw = Tables.documents(spark, dir)
      .select(($"lang" === "en").cast("long").as("y"),
        least($"n_chars", lit(1000L)).as("score"))
      .as[(Long, Long)].collect()
    // independent recount of every bucket row
    val expect = raw.groupBy(t => math.min(t._2 / 100L, 9L)).map {
      case (b, xs) =>
        val n = xs.length.toLong
        val conf = xs.map(_._2).sum / n
        val acc = 1000L * xs.map(_._1).sum / n
        b -> ((n, conf, acc, math.abs(conf - acc)))
    }
    assert(got.toMap === expect)
    assert(got.map(_._1).toSeq === got.map(_._1).toSeq.sorted)
    got.foreach { case (b, (n, conf, acc, _)) =>
      assert(b >= 0L && b <= 9L && n > 0L)
      // stated confidence lies inside its own decile
      assert(conf >= b * 100 && conf <= (if (b == 9L) 1000L else b * 100 + 99))
      assert(acc >= 0L && acc <= 1000L)
    }
    assert(got.map(_._2._1).sum === raw.length.toLong)
  }

  test("ECE is the mass-weighted gap fold; perfect calibration gives 0") {
    val cal = TextOps.calibration(spark, dir).collect()
    val r = TextOps.ece(spark, dir).head()
    val n = cal.map(_.getLong(1)).sum
    assert(r.getLong(0) === n)
    assert(r.getLong(1) === cal.length.toLong)
    assert(r.getLong(2) ===
      cal.map(x => x.getLong(1) * x.getLong(4)).sum / n)
    // arithmetic sanity: a perfectly calibrated bucket set folds to 0
    val perfect = Seq((100L, 250L, 250L), (300L, 700L, 700L))
    assert(perfect.map { case (nb, c, a) => nb * math.abs(c - a) }.sum === 0L)
  }
}
