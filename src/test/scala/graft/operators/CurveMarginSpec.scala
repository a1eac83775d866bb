package graft.operators

import graft.SparkSpec

/** recallCurve / whaleCurve / langIdMargin: consistency with the frames
  * they derive from, plus each contract's monotonicity laws.
  */
class CurveMarginSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("recallCurve is consistent with lshRecall at k = 3 and hit counts " +
      "are monotone in k") {
    val rows = Similarity.recallCurve(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L))
    rows.foreach { case (k, e, h, pm) =>
      assert(h <= e)
      assert(e <= 10L * k) // 10 probe queries, ≤ k exact rows each
      assert(pm == 1000L * h / math.max(e, 1L))
    }
    assert(rows.map(_._2).toSeq == rows.map(_._2).toSeq.sorted)
    assert(rows.map(_._3).toSeq == rows.map(_._3).toSeq.sorted)
    // the k = 3 point must equal lshRecall's totals
    val lr = Similarity.lshRecall(spark, dir).collect()
    assert(rows.last._2 == lr.map(_.getLong(1)).sum)
    assert(rows.last._3 == lr.map(_.getLong(2)).sum)
  }

  test("whaleCurve shares are ordered, cumulative, and conserve revenue") {
    val rows = Events.whaleCurve(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.map(_._1).toSeq == (1L to 10L).toSeq)
    // deciles are value-ordered: each decile's cents dominate the next
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 >= b._3)
      assert(a._5 <= b._5) // cumulative share non-decreasing
    }
    assert(rows.last._5 == 1000L)
    // top decile holds at least its proportional share
    assert(rows.head._4 >= 100L)
  }

  test("langIdMargin agrees with langNb's argmin and is non-negative") {
    val margins = TextOps.langIdMargin(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    val preds = TextOps.langNb(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(margins.keySet == preds.keySet)
    margins.foreach { case (id, (pred, m)) =>
      assert(pred == preds(id))
      assert(m >= 0L)
    }
    // on a real corpus at least one doc is confidently classified and at
    // least one is not equally confident (the margin carries signal)
    assert(margins.values.map(_._2).toSet.size > 1)
  }
}
