package graft.aria

import graft.SparkSpec

/** O12/O13 generator properties: seed-stability, partition-independence,
  * distribution sanity (SURVEY.md §5 property tests).
  */
class TxnGenSpec extends SparkSpec {

  test("generation is deterministic and partition-independent") {
    val a = TxnGen.ops(spark, 200).repartition(2)
      .collect().map(_.toSeq).sortBy(_.toString)
    val b = TxnGen.ops(spark, 200).repartition(13)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(a.sameElements(b))
  }

  test("distributions match the reference config (WR_rate, max_ops, keys_max)") {
    val cfg = TxnGen.Config()
    val rows = TxnGen.ops(spark, 2000, cfg).collect()
    val byTid = rows.groupBy(_.getLong(0))
    assert(byTid.keySet.min >= 1, "tids are 1-based")
    assert(rows.forall { r => val k = r.getLong(2); k >= 1 && k <= cfg.keysMax })
    val opCounts = byTid.values.map(_.length)
    assert(opCounts.max <= cfg.maxOps)
    val wr = rows.count(_.getBoolean(3)).toDouble / rows.length
    assert(math.abs(wr - cfg.wrRate) < 0.03, s"write ratio $wr")
    val meanOps = rows.length.toDouble / 2000
    assert(math.abs(meanOps - cfg.maxOps / 2.0) < 1.5, s"mean ops $meanOps")
  }

  test("bulk load: keys 1..n-1, 10x10 printable payloads, zeroed metadata") {
    val rows = TxnGen.bulkLoad(spark, 100).collect()
    assert(rows.length == 99)
    assert(rows.map(_.getLong(0)).sorted.sameElements(1L until 100L))
    rows.foreach { r =>
      val fields = r.getSeq[String](1)
      assert(fields.length == 10)
      assert(fields.forall(f => f.length == 10 && f.forall(c => c >= 33 && c <= 126)))
      assert(r.getInt(2) == 0 && r.getInt(3) == 0 && r.getInt(4) == 0)
    }
    // seed-stable across partitionings
    val again = TxnGen.bulkLoad(spark, 100).repartition(7)
      .collect().map(_.toSeq.toString).sorted
    assert(again.sameElements(rows.map(_.toSeq.toString).sorted))
  }

  test("golden smoke: reference flagship scenario terminates deterministically") {
    // Reference: load 200k keys / generate 150 txns / run to empty
    // (`main.cu:31-57`); scaled table to the probed keyspace for test speed.
    import org.apache.spark.sql.functions._
    val table = TxnGen.bulkLoad(spark, 20001)
      .select(col("k"), col("fields")(0).as("f0"))
    val ops = TxnGen.ops(spark, 150)
    val newValue: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =>
      org.apache.spark.sql.Column =
      (tid, ep) => concat(lit("v"), tid.cast("string"))
    // txns that drew op_count = 0 never enter the ops batch: they commit
    // trivially (reference: execute loop body never runs), so the pipeline
    // accounts only for txns with >= 1 op
    val nonEmptyTxns = ops.select("tid").distinct().count()
    val (_, h1) = AriaEngine.run(spark, table, ops, reorder = true,
      Seq("f0"), newValue)
    val (_, h2) = AriaEngine.run(spark, table, ops, reorder = true,
      Seq("f0"), newValue)
    assert(h1 == h2, "same seed => identical per-epoch commit counts")
    assert(h1.map(_._2).sum == nonEmptyTxns, "all txns eventually commit")
    // reorder policy commits at least as much per epoch as no-reorder
    val (_, hNo) = AriaEngine.run(spark, table, ops, reorder = false,
      Seq("f0"), newValue)
    assert(hNo.map(_._2).sum == nonEmptyTxns)
    assert(h1.length <= hNo.length, "reordering never needs more epochs")
  }
}
