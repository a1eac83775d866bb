package graft.operators

import graft.SparkSpec
import graft.sources.Tables

/** dsirWeights: certified by a full in-memory recompute of both unigram
  * LMs (raw + add-one-smoothed target) and the per-doc bit sums, plus the
  * separation law the operator exists for — target-domain documents must
  * score higher on average than background documents.
  */
class DsirWeightsSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  private def code(w: String): Long = {
    def at(i: Int): Long = if (i < w.length) w.charAt(i).toLong else 0L
    ((at(0) * 65536L + at(1) * 256L + at(2) + w.length) * 256L
      + (if (w.isEmpty) 0L else w.charAt(w.length - 1).toLong))
  }

  private def bitlen(x: Long): Long =
    java.lang.Long.toBinaryString(x).length.toLong

  test("per-doc importance weights match an in-memory recompute and " +
      "separate the target domain") {
    import spark.implicits._
    val got = TextOps.dsirWeights(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"lang", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val stream = docs.flatMap { case (id, lang, text) =>
      text.split(" ", -1).map(w => (id, lang, code(w)))
    }
    val cntR = stream.groupBy(_._3).map { case (k, v) => k -> v.length.toLong }
    val cntT1 = cntR.map { case (k, _) =>
      k -> (stream.count(t => t._2 == "en" && t._3 == k).toLong + 1L)
    }
    val nR = cntR.values.sum
    val nT1 = cntT1.values.sum
    def w(c: Long): Long = bitlen(nR / cntR(c)) - bitlen(nT1 / cntT1(c))

    val expect = docs.map { case (id, _, text) =>
      val ws = text.split(" ", -1).map(c => w(code(c)))
      val (n, sb) = (ws.length.toLong, ws.sum)
      id -> ((n, sb, math.floor(sb * 1000.0 / n).toLong))
    }.toMap
    assert(got == expect)

    // separation: the weight is the log ratio target/background, so the
    // mean over `en` docs must exceed the mean over the rest — otherwise
    // the importance sampler would not upweight the target domain
    val byLang = docs.map { case (id, lang, _) => lang -> got(id)._3 }
    val en = byLang.collect { case ("en", m) => m }
    val rest = byLang.collect { case (l, m) if l != "en" => m }
    assert(en.nonEmpty && rest.nonEmpty)
    assert(en.sum.toDouble / en.length > rest.sum.toDouble / rest.length,
      "target-domain docs do not score above background")
  }
}
