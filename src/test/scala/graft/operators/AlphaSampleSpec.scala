package graft.operators

import graft.SparkSpec
import graft.sources.Tables

/** alphaSample: in-memory recount of the √n weighting, quota algebra and
  * hash selection, plus the rebalancing law α-sampling exists for.
  */
class AlphaSampleSpec extends SparkSpec {

  private val dir = sf("sf0.001")
  private val M = 2147483647L

  test("alpha-sampling matches an exact recount and rebalances toward " +
      "low-resource languages") {
    import spark.implicits._
    val got = Sketches.alphaSample(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap

    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"lang", $"n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byLang = docs.groupBy(_._2).view.mapValues(_.map(t => (t._1, t._3)))
    val n = byLang.mapValues(_.size.toLong).toMap
    val w = n.map { case (l, c) => l -> math.floor(math.sqrt(c.toDouble)).toLong }
    val sw = w.values.sum
    val tpm = w.map { case (l, x) => l -> x * 1000 / sw }
    val tTotal = n.keys.map(l => n(l) * 1000 / tpm(l)).min
    val expect = n.keys.map { l =>
      val quota = tTotal * tpm(l) / 1000
      val rate = quota * 1000 / n(l)
      val sampled = byLang(l).count { case (id, nc) =>
        (id * 52361L + nc * 12289L) % M % 1000L < rate
      }.toLong
      l -> ((n(l), w(l), tpm(l), quota, rate, sampled))
    }.toMap
    assert(got == expect)

    // α = 1/2 compresses the distribution: the largest language's target
    // share sits BELOW its natural share, the smallest's above
    val total = n.values.sum
    val (maxL, minL) = (n.maxBy(_._2)._1, n.minBy(_._2)._1)
    assert(got(maxL)._3 < n(maxL) * 1000 / total)
    assert(got(minL)._3 > n(minL) * 1000 / total)
    // every rate is a valid permille
    assert(got.values.forall(v => v._5 >= 0 && v._5 <= 1000))
  }
}
