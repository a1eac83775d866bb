package graft.operators

import graft.SparkSpec

/** dedup_recall_audit_sampled: the constant-cost audit. Laws:
  *  - with S = 1 the stratum is the whole corpus, so every count equals
  *    the EXACT audit's (the sampled form degrades to the exact one);
  *  - the sampled truth count recounts from the exact AllPairs truth
  *    restricted by the same min-endpoint hash predicate in plain Scala
  *    (the sampling is BY PAIR, unbiased 1/S via the unique min id);
  *  - internal consistency: missed = truth − found, and the CI half-width
  *    is zero exactly when the sampled recall is 0 or 1.
  */
class RecallAuditSampledSpec extends SparkSpec {

  private def strat(d: Long, s: Int): Boolean =
    (d % 1000003L) * 131071L % 1000003L % s == 0L

  test("S = 1 degrades to the exact audit") {
    val dir = sf("sf0.001")
    val exact = TextOps.recallAudit(spark, dir).head()
    val sampled = TextOps.recallAuditSampled(spark, dir, strata = 1).head()
    assert(sampled.getLong(0) == exact.getLong(0)) // n_truth
    assert(sampled.getLong(1) == exact.getLong(1)) // n_found
    assert(sampled.getLong(2) == exact.getLong(2)) // n_missed
    assert(sampled.getLong(3) == exact.getLong(3)) // recall_pm
  }

  test("sampled truth recounts from the exact truth under the same hash") {
    val dir = sf("sf0.001")
    val allTruth = TextOps.prefixPairs(spark, dir)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val wantT = allTruth.count { case (a, _) => strat(a, 8) }
    val row = TextOps.recallAuditSampled(spark, dir, strata = 8).head()
    val (t, f, m) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(t == wantT, s"sampled truth $t != serial recount $wantT")
    assert(m == t - f, "missed must be truth minus found")
    assert(f <= t)
    val ci = row.getLong(4)
    if (f == 0L || f == t) assert(ci == 0L)
    else assert(ci > 0L)
  }
}
