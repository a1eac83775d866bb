package graft.operators

import graft.SparkSpec
import graft.sources.Tables

/** clusterPurity / pqDistortion: recounts against the frames they derive
  * from, plus range laws.
  */
class PurityDistortionSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("clusterPurity recomputes from dedupClusters labels and langs") {
    import spark.implicits._
    val labels = TextOps.dedupClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val langs = Tables.documents(spark, dir)
      .select($"doc_id", $"lang").as[(Long, String)].collect().toMap
    val multi = labels.groupBy(_._2).filter(_._2.size >= 2)
    // .toSeq first: mapping the Map directly would collapse clusters that
    // share the same (size, maxcnt) tuple
    val perCl = multi.toSeq.map { case (_, members) =>
      val ls = members.keys.toSeq.map(langs)
      val maxcnt = ls.groupBy(identity).values.map(_.size).max.toLong
      (members.size.toLong, maxcnt)
    }
    val r = TextOps.clusterPurity(spark, dir).collect().head
    assert(r.getLong(0) == perCl.size.toLong)
    assert(r.getLong(1) == perCl.count { case (sz, mx) => mx == sz }.toLong)
    assert(r.getLong(2) == perCl.map(_._1).sum)
    assert(r.getLong(3) == 1000L * perCl.map(_._2).sum / perCl.map(_._1).sum)
    assert(r.getLong(3) >= 500L && r.getLong(3) <= 1000L)
  }

  test("pqDistortion covers every vector in every subspace with " +
      "non-negative error") {
    import spark.implicits._
    val n = Tables.embeddings(spark, dir).count()
    val rows = Similarity.pqDistortion(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    rows.foreach { case (_, nv, tot, mean) =>
      assert(nv == n)
      assert(tot >= 0L)
      assert(mean == tot / nv)
    }
  }
}
