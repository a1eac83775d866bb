package graft.operators

import graft.SparkSpec
import graft.sources.Tables

/** bpeTrain: round-1 winner certified by an independent in-memory recount,
  * plus the two BPE theorems — winner frequency is non-increasing across
  * rounds (a merged pair's successors can't out-count it), and each round
  * shrinks the corpus by at least one and at most freq tokens.
  */
class BpeTrainSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("greedy merge rounds: recount, monotone freq, token conservation") {
    import spark.implicits._
    val rows = TextOps.bpeTrain(spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))

    // independent round-1 recount: all adjacent pairs, max by (freq, a, b)
    val texts = Tables.documents(spark, dir)
      .select($"text").collect().map(_.getString(0))
    val counts = scala.collection.mutable.Map.empty[(String, String), Long]
    texts.foreach { t =>
      val w = t.split(" ")
      var i = 0
      while (i < w.length - 1) {
        counts((w(i), w(i + 1))) = counts.getOrElse((w(i), w(i + 1)), 0L) + 1
        i += 1
      }
    }
    val (bestPair, bestFreq) = counts.toSeq
      .map { case (p, f) => (p, f) }
      .minBy { case ((a, b), f) => (-f, a, b) }
    assert(rows(0).getString(1) == bestPair._1)
    assert(rows(0).getString(2) == bestPair._2)
    assert(rows(0).getLong(3) == bestFreq)

    // theorems across rounds
    val total = texts.map(_.split(" ").length.toLong).sum
    var prevTokens = total
    var prevFreq = Long.MaxValue
    rows.foreach { r =>
      val (freq, n) = (r.getLong(3), r.getLong(4))
      assert(freq <= prevFreq, s"winner freq grew: $freq > $prevFreq")
      assert(n < prevTokens, "round merged nothing")
      assert(prevTokens - n <= freq, "merged more than counted adjacencies")
      prevFreq = freq; prevTokens = n
    }
  }

  test("pair-cache incremental trainer == replace-form chain, rounds 3 and 8") {
    for (rounds <- Seq(3, 8)) {
      val replaceForm = TextOps.bpeTrain(spark, dir, rounds).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3), r.getLong(4))).toSeq
      val cacheForm = TextOps.bpeTrainIncremental(spark, dir, rounds)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3), r.getLong(4))).toSeq
      assert(cacheForm === replaceForm, s"divergence at rounds=$rounds")
    }
  }

  test("rounds parameter: an 8-round run extends the 3-round run as an " +
      "exact prefix and every extra round keeps shrinking the corpus") {
    val r3 = TextOps.bpeTrain(spark, dir, rounds = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSeq
    val r8 = TextOps.bpeTrain(spark, dir, rounds = 8).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(r8.length == 8)
    // greedy determinism: deeper training never rewrites earlier merges
    assert(r8.take(3) == r3)
    // rounds-monotonicity: freq non-increasing, corpus strictly shrinking
    r8.sliding(2).foreach { case Seq(a, b) =>
      assert(b._4 <= a._4, s"winner freq grew at round ${b._1}")
      assert(b._5 < a._5, s"round ${b._1} merged nothing")
    }
  }
}
