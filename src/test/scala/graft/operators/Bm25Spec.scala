package graft.operators

import graft.SparkSpec
import graft.sources.Tables

/** bm25TopK: exact comparison against an independent driver-side
  * recomputation (BigInt arithmetic over the collected sf0.001 corpus) —
  * validates the integer-cleared saturation formula and the `div`
  * floor-division end to end, not just internal consistency.
  */
class Bm25Spec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("bm25TopK matches a BigInt reference implementation") {
    import spark.implicits._
    val terms = Set("spark", "query", "window")
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"text").as[(Long, String)].collect()

    val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val nDocs = BigInt(docs.length)
    val tTokens = BigInt(toks.valuesIterator.map(_.length.toLong).sum)
    val df = terms.map(w =>
      w -> BigInt(toks.valuesIterator.count(_.contains(w)))).toMap
    val expected = docs.flatMap { case (id, _) =>
      val ws = toks(id)
      val dl = BigInt(ws.length)
      val hits = terms.filter(ws.contains)
      if (hits.isEmpty) None
      else {
        val score = hits.toSeq.map { w =>
          val tf = BigInt(ws.count(_ == w))
          val idfBits = BigInt((nDocs / df(w)).bitLength)
          (idfBits * 22 * tf * tTokens * 1000) /
            (10 * tf * tTokens + 3 * tTokens + 9 * dl * nDocs)
        }.sum
        Some((id, hits.size.toLong, score.toLong))
      }
    }.sortBy { case (id, _, s) => (-s, id) }.take(10)
      .zipWithIndex
      .map { case ((id, nh, s), i) => (id, nh, s, i + 1) }

    val got = TextOps.bm25TopK(spark, dir)
      .select($"doc_id", $"n_hit_terms", $"score_millis",
        $"rnk".cast("int"))
      .as[(Long, Long, Long, Int)].collect().toSeq
    assert(got == expected.toSeq)
  }
}
