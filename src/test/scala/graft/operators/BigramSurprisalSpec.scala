package graft.operators

import graft.SparkSpec
import graft.sources.Tables

/** bigramSurprisal: certified by a full in-memory recompute of the bigram
  * LM and the per-doc conditional-bits sums (same token coding, plain
  * Scala maps), plus the model laws — conditional bits are at least 1,
  * and a deterministic bigram (its context always followed by it) scores
  * exactly 1 bit.
  */
class BigramSurprisalSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  private def code(w: String): Long = {
    def at(i: Int): Long = if (i < w.length) w.charAt(i).toLong else 0L
    ((at(0) * 65536L + at(1) * 256L + at(2) + w.length) * 256L
      + (if (w.isEmpty) 0L else w.charAt(w.length - 1).toLong))
  }

  test("per-doc conditional surprisal matches an in-memory recompute") {
    import spark.implicits._
    val got = TextOps.bigramSurprisal(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val bigrams = docs.flatMap { case (id, text) =>
      val c = text.split(" ", -1).map(code)
      c.sliding(2).filter(_.length == 2).map(p => (id, p(0), p(1)))
    }
    val cnt2 = bigrams.groupBy(b => (b._2, b._3)).map { case (k, v) => k -> v.length.toLong }
    val cnt1 = bigrams.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    def bits(c1: Long, c2: Long): Long =
      java.lang.Long.toBinaryString(cnt1(c1) / cnt2((c1, c2))).length.toLong

    val expect = docs.map { case (id, _) =>
      val bs = bigrams.filter(_._1 == id).map(b => bits(b._2, b._3))
      val (nb, sb) = (bs.length.toLong, bs.sum)
      id -> ((nb, sb, if (nb > 0) sb * 1000 / nb else 0L))
    }.toMap
    assert(got == expect)

    // model laws
    assert(got.values.forall { case (nb, sb, _) => sb >= nb },
      "some bigram scored below 1 bit")
    val deterministic = cnt2.collect {
      case ((c1, c2), n) if cnt1(c1) == n => bits(c1, c2)
    }
    assert(deterministic.forall(_ == 1L),
      "a fully deterministic bigram must cost exactly 1 bit")
    assert(got.values.exists(_._2 > got.values.map(_._1).max),
      "no doc exceeded the 1-bit floor — LM is degenerate")
  }
}
