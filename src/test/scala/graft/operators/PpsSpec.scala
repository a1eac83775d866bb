package graft.operators

import graft.SparkSpec

/** sample_pps: the systematic πps sample. Laws:
  *  - serial recount (cumulative weights, integer tick crossing);
  *  - exactly k picks with distinct pick indices covering 1..k;
  *  - certainty inclusion: every doc with w > W/k is selected.
  */
class PpsSpec extends SparkSpec {

  test("picks recount serially; size and certainty-inclusion laws") {
    val dir = sf("sf0.001")
    val k = 100L
    val docs = spark.read.parquet(dir + "/documents.parquet")
      .selectExpr("doc_id", "cast(n_chars as long) AS w").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val wt = docs.map(_._2).sum
    var cum = 0L
    val want = docs.flatMap { case (id, w) =>
      cum += w
      if (cum * k / wt > (cum - w) * k / wt)
        Some((cum * k / wt, id, w))
      else None
    }.toSeq
    val got = Sketches.ppsSystematic(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    assert(got.size == k, s"systematic πps must return exactly $k picks " +
      s"on a corpus with max w <= W/k strata, got ${got.size}")
    // certainty inclusion
    val selected = got.map(_._2).toSet
    docs.filter(_._2 > wt / k).foreach { case (id, w) =>
      assert(selected(id), s"doc $id with w=$w > W/k must be selected")
    }
  }
}
