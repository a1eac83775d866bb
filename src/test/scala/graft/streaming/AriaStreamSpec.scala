package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.aria.TxnGen

/** Streaming Aria: txn batches arriving as micro-batches run one epoch
  * each, with aborted txns carried over. Determinism is asserted for a
  * FIXED arrival order (direct processBatch calls); the real file-source
  * wiring asserts the order-insensitive invariants (every txn commits
  * exactly once, drain empties the pending set) since file listing order
  * legitimately varies between runs.
  */
class AriaStreamSpec extends SparkSpec {

  private val newValue: (org.apache.spark.sql.Column,
    org.apache.spark.sql.Column) => org.apache.spark.sql.Column =
    (tid, ep) => concat(lit("v"), tid.cast("string"), lit("e"), ep.cast("string"))

  private def table0 = {
    import spark.implicits._
    (1L to 40L).map(k => (k, s"orig$k")).toDF("k", "f0")
  }

  private def ops = TxnGen.ops(spark, 30,
    TxnGen.Config(keysMax = 50, seed = 7, maxOps = 6))

  test("fixed arrival order: deterministic history and final state") {
    import spark.implicits._
    def runFixed(): (Vector[(Int, Long, Long)], Map[Long, String]) = {
      val engine = new AriaStream(table0, reorder = true, Seq("f0"), newValue)
      // three deterministic arrival waves by tid range
      Seq((1L, 10L), (11L, 20L), (21L, 30L)).zipWithIndex.foreach {
        case ((lo, hi), i) =>
          engine.processBatch(ops.filter($"tid".between(lo, hi)), i.toLong)
      }
      engine.drain()
      (engine.history,
        engine.table.collect().map(r => r.getLong(0) -> r.getString(1)).toMap)
    }
    val (h1, t1) = runFixed()
    val (h2, t2) = runFixed()
    assert(h1 == h2 && t1 == t2, s"determinism: $h1 vs $h2")
    val nTxns = ops.select("tid").distinct().count()
    assert(h1.map(_._2).sum == nTxns, s"commit-exactly-once: $h1")
    assert(t1.values.exists(_.startsWith("v")), "some write landed")
    assert(t1.keySet == (1L to 40L).toSet, "key set unchanged")
  }

  test("file-source wiring: every txn commits exactly once and drain empties") {
    val dir = Files.createTempDirectory("graft-aria-stream").toFile.getAbsolutePath
    // arrival contract: partition by tid so each txn's ops land in ONE file
    ops.repartition(3, col("tid")).write.mode("overwrite").parquet(dir)
    val engine = new AriaStream(table0, reorder = true, Seq("f0"), newValue)
    val stream = spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
    val q = engine.writer(stream).start()
    q.awaitTermination()
    engine.drain()
    assert(engine.pending.isEmpty)
    val nTxns = ops.select("tid").distinct().count()
    assert(engine.history.map(_._2).sum == nTxns,
      s"each txn commits exactly once: ${engine.history}")
  }
}
