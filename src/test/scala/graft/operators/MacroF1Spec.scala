package graft.operators

import graft.SparkSpec

/** eval_macro_f1: serial recount from the (public) confusion matrix, plus
  * the marginal laws — tp+fp = predicted-column total, tp+fn = true-row
  * total, and the ~macro row is the floor-mean of the per-class F1s
  * (classes with no predictions included at F1 = 0, the kappa marginal
  * lesson).
  */
class MacroF1Spec extends SparkSpec {

  test("per-class F1 and macro mean match a confusion-matrix recount") {
    val dir = sf("sf0.001")
    val cm = TextOps.langIdConfusion(spark, dir)
      .select("lang", "pred_lang", "n").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val classes = (cm.keys.map(_._1) ++ cm.keys.map(_._2)).toSeq.distinct
    val per = classes.map { c =>
      val tp = cm.getOrElse((c, c), 0L)
      val fp = cm.collect { case ((_, p), n) if p == c => n }.sum - tp
      val fn = cm.collect { case ((l, _), n) if l == c => n }.sum - tp
      val f1 = math.floorDiv(2000L * tp, math.max(2 * tp + fp + fn, 1L))
      (c, tp, fp, fn, f1)
    }.sortBy(_._1)
    val macroPm = math.floorDiv(per.map(_._5).sum, per.size.toLong)

    val got = TextOps.evalMacroF1(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val (gotPer, gotMac) = got.partition(_._1 != "~macro")
    assert(gotPer.toSeq == per)
    assert(gotMac.length == 1 && gotMac.head._5 == macroPm)
    // marginal laws on the query's own rows
    gotPer.foreach { case (c, tp, fp, fn, f1) =>
      assert(f1 >= 0L && f1 <= 1000L, s"$c f1 $f1 out of range")
      if (tp == 0L) assert(f1 == 0L)
    }
  }
}
