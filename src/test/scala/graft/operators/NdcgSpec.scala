package graft.operators

import graft.SparkSpec

/** eval_ndcg: the distributed nDCG@10 recounts from a serial ranking of
  * collected quantized embeddings, and the metric laws hold — dcg ≤ idcg
  * (the ideal prefix dominates any placement of the same relevant count,
  * because positional weights strictly decrease), so ndcg_pm ≤ 1000.
  */
class NdcgSpec extends SparkSpec {

  private val wts = Seq(13860L, 9240L, 6930L, 5544L, 4620L,
    3960L, 3465L, 3080L, 2772L, 2520L)

  test("nDCG@10 recounts from a serial exact ranking") {
    val dir = sf("sf0.001")
    val emb = spark.read.parquet(dir + "/embeddings.parquet")
      .selectExpr("vec_id", "CAST(label AS LONG) AS label",
        "transform(embedding, x -> CAST(floor(x * 10000) AS LONG)) AS q")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toArray))
    val qs = emb.filter(_._1 < 10)
    val corpus = emb.filter(_._1 >= 10)
    val nLabel = corpus.groupBy(_._2).map { case (l, g) =>
      l -> g.length
    }
    val cum = wts.scanLeft(0L)(_ + _).tail
    val want = qs.sortBy(_._1).map { case (qid, lbl, qq) =>
      val ranked = corpus.map { case (vid, l, v) =>
        val d2 = v.zip(qq).map { case (a, b) =>
          BigInt(a - b) * (a - b)
        }.sum
        (d2, vid, l)
      }.sortBy(t => (t._1, t._2)).take(10)
      val dcg = ranked.zipWithIndex.collect {
        case ((_, _, l), i) if l == lbl => wts(i)
      }.sum
      val nRel = ranked.count(_._3 == lbl).toLong
      val idcg = cum(math.min(10, nLabel(lbl)) - 1)
      (qid, lbl, nRel, dcg, idcg, 1000L * dcg / idcg)
    }
    val got = Similarity.evalNdcg(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == want.toSeq)
  }

  test("dcg never exceeds the ideal and ndcg_pm stays in [0, 1000]") {
    val got = Similarity.evalNdcg(spark, sf("sf0.001")).collect()
    assert(got.length == 10)
    got.foreach { r =>
      assert(r.getLong(3) <= r.getLong(4), s"dcg <= idcg: $r")
      assert(r.getLong(5) >= 0L && r.getLong(5) <= 1000L, s"band: $r")
    }
  }
}
