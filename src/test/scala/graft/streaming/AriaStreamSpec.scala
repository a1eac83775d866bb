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

  test("a batch that fails mid-persist rolls back ALL engine state and retries clean") {
    import spark.implicits._
    val stateDir = Files.createTempDirectory("graft-aria-rb").toFile.getAbsolutePath
    val engine = new AriaStream(table0, reorder = true, Seq("f0"), newValue,
      stateDir = Some(stateDir))
    engine.processBatch(ops.filter($"tid".between(1L, 10L)), 0L)
    val (t0, h0, e0) = (engine.table.collect().toSet, engine.history, engine.epoch)
    // Sabotage the NEXT snapshot commit: a marker-less squatter at s=1 is
    // invisible to committedStates (so no resume picks it up) but makes
    // AtomicDir.commit fail AFTER the epoch has computed and the in-memory
    // fields have advanced — the exact window the rollback must cover.
    val squatter = new java.io.File(s"$stateDir/s=1")
    assert(squatter.mkdirs())
    val failed = intercept[IllegalStateException] {
      engine.processBatch(ops.filter($"tid".between(11L, 20L)), 1L)
    }
    assert(failed.getMessage.contains("committed concurrently"))
    assert(engine.table.collect().toSet == t0, "table rolled back")
    assert(engine.history == h0 && engine.epoch == e0, "history/epoch rolled back")
    // retry of the SAME batch id after the blocker clears must not be
    // treated as a replay and must produce the same result as a clean run
    assert(squatter.delete())
    engine.processBatch(ops.filter($"tid".between(11L, 20L)), 1L)
    assert(engine.history.size > h0.size, "retried batch was processed, not skipped")
    val resumed = new AriaStream(table0.limit(0), reorder = true, Seq("f0"),
      newValue, stateDir = Some(stateDir))
    assert(resumed.table.collect().toSet == engine.table.collect().toSet,
      "disk snapshot matches memory after the retried commit")
  }

  test("multi-table sink: composite keys isolate tables; batch-split invariance") {
    import spark.implicits._
    val kc = Seq("table_id", "k")
    // payload carries the tid only (NOT the epoch): consecutive-split
    // invariance is over WHAT committed, while epoch numbering is
    // legitimately batching-dependent
    val tidValue: (org.apache.spark.sql.Column,
      org.apache.spark.sql.Column) => org.apache.spark.sql.Column =
      (tid, _) => concat(lit("v"), tid.cast("string"))
    val reg = (for (t <- 0L to 1L; k <- 1L to 10L)
      yield (t, k, s"orig${t}_$k")).toDF("table_id", "k", "f0")
    // interleaved two-table batch: tid t writes cell (t % 2, t % 10 + 1)
    // AND reads the same numeric k in the OTHER table — contested within
    // a table, never across tables
    val ops = (1L to 24L).flatMap { t =>
      Seq((t, 0, t % 2, t % 10 + 1, true),
        (t, 1, 1L - t % 2, t % 10 + 1, false))
    }.toDF("tid", "opidx", "table_id", "k", "isUpdate")
    def run(splits: Seq[(Long, Long)]): (Long, Set[(Long, Long, String)]) = {
      val e = new AriaStream(reg, reorder = true, Seq("f0"), tidValue,
        keyCols = kc)
      splits.zipWithIndex.foreach { case ((lo, hi), i) =>
        e.processBatch(ops.filter($"tid".between(lo, hi)), i.toLong)
      }
      e.drain()
      (e.history.map(_._2).sum,
        e.table.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet)
    }
    val (n1, t1) = run(Seq((1L, 24L)))
    val (n2, t2) = run(Seq((1L, 8L), (9L, 16L), (17L, 24L)))
    assert(n1 === 24L, "every txn commits exactly once in the single batch")
    assert(n2 === 24L, "every txn commits exactly once under the split")
    assert(t1 === t2, "consecutive batch splits converge to the same table")
    // per contested cell the ascending-tid drain leaves the LARGEST
    // writer; the same numeric k in the other table is untouched by it
    val byCell = t1.groupBy(c => (c._1, c._2)).map { case (c, vs) =>
      c -> vs.head._3 }
    (1L to 10L).foreach { k =>
      val writers = (1L to 24L).filter(t => t % 10 + 1 == k)
      Seq(0L, 1L).foreach { tbl =>
        val own = writers.filter(_ % 2 == tbl)
        val expect = if (own.nonEmpty) s"v${own.max}" else s"orig${tbl}_$k"
        assert(byCell((tbl, k)) === expect,
          s"cell ($tbl, $k): ${byCell((tbl, k))} != $expect")
      }
    }
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
