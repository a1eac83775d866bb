package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** heapsCurve: conservation and monotonicity laws beyond the DuckDB gate.
  * The curve's last row must account for the WHOLE corpus (total tokens,
  * full vocabulary), each prefix must be monotone in both coordinates,
  * and the rate column must be the exact integer permille of its row.
  */
class HeapsCurveSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("heaps curve is monotone, conserves tokens and vocabulary, and " +
      "its rate is the exact permille") {
    import spark.implicits._
    val rows = TextOps.heapsCurve(spark, dir).collect()
    assert(rows.nonEmpty)
    // buckets are doc-id bitlengths: strictly increasing, <= 64 of them
    val buckets = rows.map(_.getLong(0))
    assert(buckets.sameElements(buckets.sorted.distinct) && rows.length <= 64)

    val toks = Tables.documents(spark, dir)
      .select(explode(split($"text", " ")).as("w"))
    val totalTokens = toks.count()
    val vocab = toks.distinct().count()
    // final checkpoint = the whole corpus
    assert(rows.last.getLong(1) == totalTokens)
    assert(rows.last.getLong(2) == vocab)

    // cumulative coordinates are monotone; vocab growth can't outpace
    // token growth between checkpoints (each new type costs >=1 token)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getLong(1) > a.getLong(1)) // cum_tokens strictly grows
        assert(b.getLong(2) >= a.getLong(2)) // cum_vocab non-decreasing
        assert(b.getLong(2) - a.getLong(2) <= b.getLong(1) - a.getLong(1))
      case _ => ()
    }
    // vocab_pm is exact integer permille of the same row's cumulatives
    rows.foreach { r =>
      assert(r.getLong(3) == 1000L * r.getLong(2) / r.getLong(1))
    }
  }
}
