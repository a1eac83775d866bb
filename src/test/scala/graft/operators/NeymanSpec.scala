package graft.operators

import graft.SparkSpec

/** sample_neyman: the allocation recounts from a serial per-stratum fold
  * with the same integer sqrt arithmetic, and the design laws hold — the
  * budget is never exceeded, realized samples are exact top-n_h by hash,
  * and higher N·σ never earns a smaller allocation.
  */
class NeymanSpec extends SparkSpec {

  private case class Row6(lang: String, nTotal: Long, nsig: Long,
      neyman: Long, prop: Long, nSampled: Long, avgLen: Long)

  private def collectRows(dir: String): Seq[Row6] =
    Sketches.neymanSample(spark, dir).collect().map(r =>
      Row6(r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq

  test("allocation equals the serial recount") {
    import spark.implicits._
    val dir = sf("sf0.001")
    val M = 2147483647L
    val docs = spark.read.parquet(dir + "/documents.parquet")
      .selectExpr("lang", "doc_id", "n_chars::LONG AS x")
      .as[(String, Long, Long)].collect()
    val strata = docs.groupBy(_._1).toSeq.map { case (lang, g) =>
      val n = g.length.toLong
      val sh = g.map(_._3).sum
      val qh = g.map(r => r._3 * r._3).sum
      (lang, n, g, math.floor(math.sqrt((n * qh - sh * sh).toDouble)).toLong)
    }
    val tt = strata.map(_._4).sum
    val nn = strata.map(_._2).sum
    val want = strata.map { case (lang, n, g, nsig) =>
      val neyman = nsig * 100L / tt
      val taken = g.map { case (_, id, x) =>
        (((id * 131071L + x * 8191L) % M) % 1000L, id, x)
      }.sortBy(r => (r._1, r._2)).take(neyman.toInt)
      Row6(lang, n, nsig, neyman, n * 100L / nn, taken.length.toLong,
        if (taken.isEmpty) -1L else taken.map(_._3).sum / taken.length)
    }.sortBy(_.lang)
    assert(collectRows(dir) == want)
  }

  test("design laws: budget, monotonicity, sample exactness") {
    val rows = collectRows(sf("sf0.001"))
    assert(rows.map(_.neyman).sum <= 100L, "floor allocation under budget")
    assert(rows.map(_.prop).sum <= 100L)
    rows.foreach { r =>
      assert(r.nSampled == math.min(r.neyman, r.nTotal),
        s"realized sample must be exactly top-n_h: $r")
    }
    val sorted = rows.sortBy(_.nsig)
    assert(sorted.map(_.neyman) == sorted.map(_.neyman).sorted,
      "higher N·σ never earns a smaller allocation")
    assert(rows.exists(r => r.neyman != r.prop),
      "calibration: Neyman should actually differ from proportional here")
  }
}
