package graft.aria

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** r17 focused law: [[AriaEngine.decisionsFused]] (reservation minima as
  * per-key window aggregates fused into the verdict pass) must be
  * row-identical to the two-pass `decisions(ops, reservations(ops))` it
  * replaced in the epoch loop and the verdict queries — on single- AND
  * composite-key batches, including the edge shapes the window form
  * could plausibly diverge on (keys with no writer ⇒ wts NULL; a txn
  * touching one key it alone reserves; repeated ops of one txn on one
  * key).
  */
class DecisionsFusedSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("decisionsFused == decisions(ops, reservations(ops)) on a single-key batch") {
    val ops = Seq(
      // (tid, opidx, k, isUpdate)
      (1L, 1, 10L, true), (1L, 2, 11L, false),
      (2L, 1, 10L, false), (2L, 2, 12L, true),
      (3L, 1, 11L, true), (3L, 2, 12L, true), (3L, 3, 12L, true),
      (4L, 1, 13L, false), // read-only txn on a key nobody writes
      (5L, 1, 13L, false), (5L, 2, 10L, true))
      .toDF("tid", "opidx", "k", "isUpdate")
    val slow = AriaEngine.decisions(ops, AriaEngine.reservations(ops))
    val fused = AriaEngine.decisionsFused(ops)
    assert(rows(fused) == rows(slow))
  }

  test("decisionsFused == two-pass decisions on a composite-key batch") {
    val ops = Seq(
      (1L, 1, 0L, 5L, true), (1L, 2, 1L, 5L, false), // same k, two tables
      (2L, 1, 0L, 5L, true), (2L, 2, 1L, 6L, true),
      (3L, 1, 1L, 5L, true), (3L, 2, 0L, 7L, false))
      .toDF("tid", "opidx", "table_id", "k", "isUpdate")
    val keys = Seq("table_id", "k")
    val slow = AriaEngine.decisions(ops, AriaEngine.reservations(ops, keys), keys)
    val fused = AriaEngine.decisionsFused(ops, keys)
    assert(rows(fused) == rows(slow))
    // the composite key must keep same-k-different-table non-conflicting:
    // tid 3 writes (1,5) while tid 1 writes (0,5) — no WAW between them
    val t3 = fused.filter($"tid" === 3L)
      .select($"waw").as[Boolean].collect()
    assert(t3.toSeq == Seq(false))
  }

  test("corpus-derived batch: fused and two-pass agree at sf0.001") {
    val ops = graft.sources.Tables.lineitem(spark, sf("sf0.001"))
      .filter($"l_orderkey" % 101 === 0)
      .select($"l_orderkey".as("tid"), $"l_linenumber".as("opidx"),
        ($"l_partkey" % 20000 + 1).as("k"),
        ($"l_linenumber" % 5 < 2).as("isUpdate"))
    val slow = AriaEngine.decisions(ops, AriaEngine.reservations(ops))
    val fused = AriaEngine.decisionsFused(ops)
    assert(rows(fused) == rows(slow))
  }
}
