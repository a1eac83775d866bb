package graft.operators

import graft.SparkSpec
import graft.sources.Tables

/** bpeEncode: certified by a full in-memory re-encode — the 3 learned
  * merges (taken from bpeTrain's own report) replayed left-greedily over
  * every document with plain Scala string ops — plus the accounting laws:
  * n_ws is the exact whitespace token count, n_merged = n_ws - n_bpe ≥ 0,
  * and the corpus-total n_bpe equals bpeTrain's round-3 n_tokens.
  */
class BpeEncodeSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("per-doc BPE token counts match an in-memory greedy re-encode") {
    import spark.implicits._
    val merges = TextOps.bpeTrain(spark, dir).collect()
      .map(r => (r.getString(1), r.getString(2)))
    val trainFinal = TextOps.bpeTrain(spark, dir).collect().last.getLong(4)

    val got = TextOps.bpeEncode(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expect = docs.map { case (id, text) =>
      // same rendering + literal non-overlapping replace as the engine
      var t = "|" + text.replace(" ", "||") + "|"
      merges.foreach { case (a, b) =>
        t = t.replace("|" + a + "||" + b + "|", "|" + a + "@" + b + "|")
      }
      val nWs = text.split(" ", -1).length.toLong
      val nBpe = t.count(_ == '|').toLong / 2
      id -> ((nWs, nBpe, nWs - nBpe))
    }.toMap
    assert(got == expect)

    // accounting laws
    got.values.foreach { case (nWs, nBpe, nMerged) =>
      assert(nMerged >= 0 && nMerged == nWs - nBpe && nBpe >= 1)
    }
    assert(got.values.map(_._2).sum == trainFinal,
      "corpus-total n_bpe != bpeTrain round-3 n_tokens")
    assert(got.values.exists(_._3 > 0), "no doc had any merge applied")
  }
}
