package graft.operators

import graft.SparkSpec

/** eval_rank_battery: AP@10 and RR recount from a serial exact ranking,
  * and the metric laws hold — AP ≤ 1 (each precision term ≤ 1 and the
  * R̃ normalizer dominates), RR = 10⁶/first-hit, and the triad is
  * mutually consistent with eval_ndcg's relevant counts.
  */
class RankBatterySpec extends SparkSpec {

  test("AP@10 and RR recount from a serial exact ranking") {
    val dir = sf("sf0.001")
    val emb = spark.read.parquet(dir + "/embeddings.parquet")
      .selectExpr("vec_id", "CAST(label AS LONG) AS label",
        "transform(embedding, x -> CAST(floor(x * 10000) AS LONG)) AS q")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toArray))
    val qs = emb.filter(_._1 < 10)
    val corpus = emb.filter(_._1 >= 10)
    val nLabel = corpus.groupBy(_._2).map { case (l, g) => l -> g.length }
    val want = qs.sortBy(_._1).map { case (qid, lbl, qq) =>
      val ranked = corpus.map { case (vid, l, v) =>
        (v.zip(qq).map { case (a, b) => BigInt(a - b) * (a - b) }.sum,
          vid, l)
      }.sortBy(t => (t._1, t._2)).take(10)
      val rels = ranked.map(_._3 == lbl)
      val nRel = rels.count(identity).toLong
      var ck = 0L
      val apNum = rels.zipWithIndex.map { case (r, i) =>
        if (r) { ck += 1; ck * (2520L / (i + 1)) } else 0L
      }.sum
      val fr = rels.indexOf(true) match {
        case -1 => 0L
        case i  => (i + 1).toLong
      }
      val rr = if (fr == 0) 0L else 1000000L / fr
      val ap = if (nRel == 0) 0L
        else 1000L * apNum / (2520L * math.min(10, nLabel(lbl)))
      (qid, lbl, nRel, fr, rr, apNum, ap)
    }
    val got = Similarity.evalRankBattery(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toSeq == want.toSeq)
  }

  test("metric bands and cross-metric consistency with nDCG") {
    val dir = sf("sf0.001")
    val rb = Similarity.evalRankBattery(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(6)))
      .toMap
    val nd = Similarity.evalNdcg(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(rb.keySet == nd.keySet)
    rb.foreach { case (qid, (nRel, fr, ap)) =>
      assert(nRel == nd(qid), s"$qid n_rel agrees with eval_ndcg")
      assert(ap >= 0L && ap <= 1000L, s"$qid AP band")
      assert((fr == 0L) == (nRel == 0L), s"$qid first-hit iff any hit")
    }
  }
}
