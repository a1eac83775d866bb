package graft.operators

import graft.SparkSpec

/** dedup_recall_audit: found ⊆ truth (verified LSH pairs can never exceed
  * the complete AllPairs truth), the counts reconcile against the two
  * source queries run independently, and the missed-Jaccard range sits
  * inside [800, 1000].
  */
class RecallAuditSpec extends SparkSpec {

  test("counts reconcile against the source pair queries") {
    val dir = sf("sf0.001")
    val r = Audit.row(spark, dir)
    val truth = TextOps.prefixPairs(spark, dir).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(r.nTruth == truth.size.toLong)
    assert(r.nFound + r.nMissed == r.nTruth,
      "found and missed partition the truth")
    assert(r.recallPm == r.nFound * 1000L / r.nTruth)
  }

  test("missed pairs carry real >=0.8 Jaccards (or the -1 sentinel)") {
    val r = Audit.row(spark, sf("sf0.001"))
    if (r.nMissed == 0L) {
      assert(r.minJac == -1L && r.maxJac == -1L)
    } else {
      assert(r.minJac >= 800L && r.maxJac <= 1000L && r.minJac <= r.maxJac)
    }
    assert(r.nTruth > 0L, "degenerate corpus: empty truth")
  }

  private object Audit {
    case class R(nTruth: Long, nFound: Long, nMissed: Long, recallPm: Long,
        minJac: Long, maxJac: Long)
    def row(s: org.apache.spark.sql.SparkSession, dir: String): R = {
      val x = TextOps.recallAudit(s, dir).collect().head
      R(x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getLong(5))
    }
  }
}
