package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** cooccurLift: canonical pair orientation, min-support, ordering, and an
  * exact recount of the pair frequency for the top collocation.
  */
class CooccurLiftSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("cooccurLift ranks supported canonical pairs by exact lift") {
    import spark.implicits._
    val top = TextOps.cooccurLift(spark, dir).localCheckpoint(true)
    val n = top.count()
    assert(n > 0 && n <= 20)
    assert(top.filter($"a" > $"b").count() == 0)
    assert(top.filter($"n_ab" < 5).count() == 0)
    assert(top.filter($"lift" <= 0d).count() == 0)
    assert(top.agg(sum($"rnk")).head().getLong(0) == n * (n + 1) / 2)

    // ordering law: rnk order = (lift desc, a, b)
    val rows = top.select($"lift", $"a", $"b", $"rnk")
      .as[(Double, String, String, Int)].collect().sortBy(_._4)
    assert(rows.toSeq == rows.sortBy { case (l, a, b, _) => (-l, a, b) }.toSeq)

    // exact recount of n_ab for the #1 pair from the raw corpus
    val (la, lb, cnt) = top.filter($"rnk" === 1)
      .select($"a", $"b", $"n_ab").as[(String, String, Long)].head()
    val docs = Tables.documents(spark, dir).select($"text").as[String].collect()
    var recount = 0L
    docs.foreach { t =>
      val ws = t.split(" ")
      var i = 0
      while (i < ws.length) {
        var k = 1
        while (k <= 3 && i + k < ws.length) {
          val x = ws(i); val y = ws(i + k)
          val lo = if (x <= y) x else y
          val hi = if (x <= y) y else x
          if (lo == la && hi == lb) recount += 1
          k += 1
        }
        i += 1
      }
    }
    assert(recount == cnt, s"recount $recount != $cnt for ($la,$lb)")
  }
}
