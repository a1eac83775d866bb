package graft.operators

import graft.SparkSpec

/** softBudget: consistency with tokenBudget and softWeights, plus the
  * budget-fit law on effective mass.
  */
class SoftBudgetSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("soft budget fits the effective-token budget tightly and agrees " +
      "with its inputs") {
    val soft = TextOps.softBudget(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    val weights = TextOps.softWeights(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val raw = TextOps.tokenBudget(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(soft.keySet == weights.keySet)
    soft.foreach { case (id, (nt, wpm, eff, ttr, _)) =>
      assert(wpm == weights(id))
      assert(eff == nt * wpm)
      assert((nt, ttr) == raw(id))
    }
    // the kept set is a TTR threshold set: every kept doc scores at least
    // as high as every dropped doc
    val keptTtr = soft.values.collect { case (_, _, _, t, 1L) => t }
    val dropTtr = soft.values.collect { case (_, _, _, t, 0L) => t }
    assert(keptTtr.nonEmpty && dropTtr.nonEmpty)
    assert(keptTtr.min >= dropTtr.max)
    // budget-fit: kept effective mass ≤ 10% of total, and admitting the
    // next-best TTR bucket would overshoot
    val total = soft.values.map(_._3).sum
    val kept = soft.values.collect { case (_, _, e, _, 1L) => e }.sum
    assert(kept <= total / 10L)
    val nextBucket = dropTtr.max
    val overshoot = kept + soft.values.collect {
      case (_, _, e, t, 0L) if t == nextBucket => e
    }.sum
    assert(overshoot > total / 10L)
  }
}
