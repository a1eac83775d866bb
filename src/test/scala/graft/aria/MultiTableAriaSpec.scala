package graft.aria

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Multi-table Aria semantics (reference `src/database/common/database.h:
  * 10-22` — the 2-D table registry): conflicts key on the COMPOSITE
  * (table_id, k), so identical numeric keys in different tables are
  * independent cells; and the composite-key engine restricted to one
  * table must reproduce the single-key engine exactly (the byte-identical
  * regression the generalization is gated on).
  */
class MultiTableAriaSpec extends SparkSpec {

  private val kc = Seq("table_id", "k")

  // (tid, opidx, table_id, k, isUpdate)
  private def opsDf(rows: Seq[(Long, Int, Long, Long, Boolean)]): DataFrame = {
    import spark.implicits._
    rows.toDF("tid", "opidx", "table_id", "k", "isUpdate")
  }

  private def regDf(cells: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    cells.map { case (t, k) => (t, k, s"orig${t}_$k") }
      .toDF("table_id", "k", "f0")
  }

  private val newValue: (org.apache.spark.sql.Column,
    org.apache.spark.sql.Column) => org.apache.spark.sql.Column =
    (tid, ep) =>
      concat(lit("v"), tid.cast("string"), lit("e"), ep.cast("string"))

  private def decide(ops: DataFrame, reg: DataFrame)
      : Map[Long, (Boolean, Boolean, Boolean)] = {
    val live = AriaEngine.liveOps(ops, reg, kc)
    AriaEngine.decisions(live, AriaEngine.reservations(live, kc), kc)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))))
      .toMap
  }

  test("same numeric key in different tables never conflicts") {
    // t1 writes (0, 10); t2 writes (1, 10) — same k, different cells
    val d = decide(
      opsDf(Seq((1L, 0, 0L, 10L, true), (2L, 0, 1L, 10L, true))),
      regDf(Seq((0L, 10L), (1L, 10L))))
    assert(d(1) === ((false, false, false)))
    assert(d(2) === ((false, false, false)))
  }

  test("same cell in the same table conflicts exactly as single-table") {
    val d = decide(
      opsDf(Seq((1L, 0, 0L, 10L, true), (2L, 0, 0L, 10L, true))),
      regDf(Seq((0L, 10L))))
    assert(d(1) === ((false, false, false)))
    assert(d(2) === ((true, true, true))) // raw, war, waw vs tid 1
  }

  test("a txn's flags aggregate across every table it touches") {
    // t2 is clean on table 1 but loses a WAW on table 0 — it aborts
    val d = decide(
      opsDf(Seq(
        (1L, 0, 0L, 5L, true),
        (2L, 0, 1L, 7L, true), (2L, 1, 0L, 5L, true))),
      regDf(Seq((0L, 5L), (1L, 7L))))
    assert(d(2)._3 === true) // waw via (0, 5)
    assert(d(1) === ((false, false, false)))
  }

  test("composite-key engine on one table == single-key engine, bit for bit") {
    import spark.implicits._
    // a contested single-table batch (mixed reads/writes, retries needed)
    val rows = (1L to 20L).map(t =>
      (t, 0, 0L, 3L + t % 4, t % 3 != 0L))
    val multiOps = opsDf(rows)
    val singleOps = multiOps.drop("table_id")
    val multiReg = regDf((3L to 7L).map((0L, _)))
    val singleReg = multiReg.drop("table_id")
    val (ftM, hM) = AriaEngine.run(spark, multiReg, multiOps,
      reorder = true, Seq("f0"), newValue, keyCols = kc)
    val (ftS, hS) = AriaEngine.run(spark, singleReg, singleOps,
      reorder = true, Seq("f0"), newValue)
    assert(hM === hS)
    val m = ftM.select($"k", $"f0").orderBy($"k").collect().toSeq
    val s = ftS.select($"k", $"f0").orderBy($"k").collect().toSeq
    assert(m === s)
  }

  test("install == installValues with a uniform map, bit for bit") {
    import spark.implicits._
    val reg = regDf(Seq((0L, 1L), (0L, 2L)))
    val win = Seq((0L, 1L, 5L, 1)).toDF("table_id", "k", "writer_tid",
      "win_epoch")
    val a = AriaEngine.install(reg, win, Seq("f0"), newValue, kc)
      .orderBy($"k").collect().toSeq
    val b = AriaEngine.installValues(reg, win, Map("f0" -> newValue), kc)
      .orderBy($"k").collect().toSeq
    assert(a === b)
  }

  test("heterogeneous install writes each table's own typed columns") {
    import spark.implicits._
    // table frame with a string and a numeric payload column
    val t = Seq((1L, "orig", 10L), (2L, "keep", 20L))
      .toDF("k", "name", "bal")
    val win = Seq((1L, 7L, 2)).toDF("k", "writer_tid", "win_epoch")
    val out = AriaEngine.installValues(t, win, Map(
        "name" -> ((tid, ep) => concat(lit("w"), tid.cast("string"),
          lit("e"), ep.cast("string"))),
        "bal" -> ((tid, ep) => tid * lit(100L) + ep)))
      .orderBy($"k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(out === Seq((1L, "w7e2", 702L), (2L, "keep", 20L)))
  }

  test("multi-epoch drain over two tables installs the last-epoch winner per cell") {
    import spark.implicits._
    // table 0 cell 1 is contested by tids 1..3 (all writers, forced
    // serial: each epoch commits exactly the smallest remaining tid);
    // table 1 cell 1 has a single writer
    val ops = opsDf(Seq(
      (1L, 0, 0L, 1L, true), (2L, 0, 0L, 1L, true), (3L, 0, 0L, 1L, true),
      (4L, 0, 1L, 1L, true)))
    val reg = regDf(Seq((0L, 1L), (1L, 1L)))
    val (ft, history) = AriaEngine.run(spark, reg, ops,
      reorder = true, Seq("f0"), newValue, keyCols = kc)
    // epoch 1: tids 1 and 4 commit; epoch 2: tid 2; epoch 3: tid 3
    assert(history === Seq((1, 2L, 2L), (2, 1L, 1L), (3, 1L, 0L)))
    val cells = ft.orderBy($"table_id", $"k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(cells === Seq((0L, 1L, "v3e3"), (1L, 1L, "v4e1")))
  }
}
