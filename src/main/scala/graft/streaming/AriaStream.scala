package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.aria.AriaEngine

/** The Aria epoch engine as a Structured Streaming job (SURVEY.md §7.2 M4:
  * "foreachBatch reusing the epoch merge as the stateful sink").
  *
  * The reference's epoch loop (`/root/reference/src/database/ycsb/db.h:104-125`)
  * IS a micro-batch pattern: arriving txn batches map 1:1 onto Structured
  * Streaming micro-batches. Each micro-batch runs ONE deterministic epoch
  * over (carried-over aborted txns ∪ newly arrived txns); committed writes
  * install into the next table version; aborted txns retry in the next
  * micro-batch — the reference's Collect-phase carryover
  * (`TransctionManager.cuh:165-185`), with stream arrival replacing batch
  * generation.
  *
  * Scale: state = one table snapshot + the pending-ops set, both
  * checkpointed per micro-batch; all per-epoch work is the same
  * shuffle-aggregation DAG as the batch engine.
  *
  * Arrival contract: a txn's ops must arrive WITHIN one micro-batch
  * (stage arrival files partitioned by tid) — a txn split across
  * micro-batches would decide twice on partial op sets. This mirrors the
  * reference, where a `Transction<N>` is always materialized whole before
  * the epoch runs (`TransctionManager.cuh:59-85`).
  *
  * Durability: with `stateDir` set, every epoch commits (table, pending,
  * history, last batch id) as an atomically-renamed parquet snapshot
  * `stateDir/s=N`; a new AriaStream over the same `stateDir` resumes from
  * the latest committed snapshot, and a micro-batch replayed by the
  * streaming engine after a crash (its id ≤ the persisted last batch id)
  * is skipped — together with the source's own `checkpointLocation`, the
  * epoch pipeline is exactly-once across driver failures. Without
  * `stateDir`, state is in-memory only (tests/exploration).
  */
class AriaStream(
    table0: DataFrame,
    reorder: Boolean,
    valueCols: Seq[String],
    newValue: (Column, Column) => Column,
    stateDir: Option[String] = None,
    // `Seq("table_id", "k")` runs the sink over the MULTI-TABLE registry
    // (reference `src/database/common/database.h:10-22`): ops address the
    // composite cell, conflicts/installs key on it, and the snapshot/
    // resume path is unchanged (the registry is one frame either way).
    keyCols: Seq[String] = Seq("k")) extends Serializable {

  @volatile var table: DataFrame = null
  @volatile var pending: Option[DataFrame] = None
  @volatile var epoch: Int = 1
  @volatile var history: Vector[(Int, Long, Long)] = Vector.empty
  @volatile private var lastBatchId: Long = -1L
  @volatile private var stateVersion: Int = -1

  private def spark = table0.sparkSession

  private def committedStates(dir: String): Seq[Int] =
    graft.sources.AtomicDir.committed(spark, dir, "s=")

  private def resumeFrom(dir: String): Unit =
    committedStates(dir).lastOption.foreach { n =>
      val base = s"$dir/s=$n"
      table = spark.read.parquet(s"$base/table").localCheckpoint(true)
      val p = spark.read.parquet(s"$base/pending").localCheckpoint(true)
      pending = if (p.isEmpty) None else Some(p)
      history = spark.read.parquet(s"$base/history")
        .orderBy("epoch").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toVector
      epoch = history.lastOption.map(_._1 + 1).getOrElse(1)
      lastBatchId = spark.read.parquet(s"$base/meta")
        .collect().head.getLong(0)
      stateVersion = n
    }

  stateDir.foreach(resumeFrom)
  // resume replaces the table; only pay the base-table materialization
  // when there is no snapshot to resume from
  if (table == null) table = table0.localCheckpoint(true)

  /** Atomic snapshot commit via [[graft.sources.AtomicDir]]; retains the
    * last two snapshots.
    */
  private def persistState(emptyOps: DataFrame): Unit = stateDir.foreach { dir =>
    val sp = spark
    import sp.implicits._
    val n = stateVersion + 1
    graft.sources.AtomicDir.commit(sp, s"$dir/s=$n") { tmp =>
      table.write.parquet(s"$tmp/table")
      pending.getOrElse(emptyOps).write.parquet(s"$tmp/pending")
      history.toDF("epoch", "committed", "aborted")
        .coalesce(1).write.parquet(s"$tmp/history")
      Seq(lastBatchId).toDF("last_batch_id")
        .coalesce(1).write.parquet(s"$tmp/meta")
    }
    stateVersion = n
    // Retention is best-effort: once s=n is committed the epoch has
    // durably succeeded, and a cleanup hiccup must not fail the batch —
    // a failure AFTER the commit would make the rollback-and-retry path
    // re-run the epoch against an already-advanced snapshot.
    try {
      val f = new Path(dir)
        .getFileSystem(sp.sparkContext.hadoopConfiguration)
      committedStates(dir).dropRight(2)
        .foreach(o => f.delete(new Path(s"$dir/s=$o"), true))
    } catch {
      case scala.util.control.NonFatal(t) =>
        AriaStream.log.warn(s"snapshot retention sweep failed under $dir " +
          "(stale snapshots remain; next commit retries the sweep)", t)
    }
  }

  /** Run `body` with all-or-nothing semantics over the engine's mutable
    * fields: on failure every field — not just the batch high-water mark —
    * is restored to its pre-step value, so a retry of the same batch on
    * this instance re-runs the epoch against the original state instead of
    * double-applying it on top of a half-advanced one. This is sound
    * because [[persistState]] mutates `stateVersion` only after its
    * snapshot commit succeeded and treats retention as best-effort: a
    * failure anywhere in `body` implies no new snapshot was committed, so
    * memory and disk roll back together.
    */
  private def atomically(body: => Unit): Unit = {
    val (t0, p0, e0, h0, b0, v0) =
      (table, pending, epoch, history, lastBatchId, stateVersion)
    try body
    catch {
      case t: Throwable =>
        table = t0; pending = p0; epoch = e0; history = h0
        lastBatchId = b0; stateVersion = v0
        throw t
    }
  }

  /** One epoch over `ops`: decide, install, record history, carry aborts. */
  private def step(ops: DataFrame): Unit = {
    val nTxns = ops.select("tid").distinct().count()
    if (nTxns > 0) {
      val (next, _, aborted) = AriaEngine.runEpoch(
        table, ops, reorder, valueCols, newValue, epoch, keyCols)
      val nextT = next.localCheckpoint(true)
      val opsNext = ops.join(broadcast(aborted), Seq("tid"), "left_semi")
        .localCheckpoint(true)
      val nAborted = opsNext.select("tid").distinct().count()
      history = history :+ ((epoch, nTxns - nAborted, nAborted))
      table = nextT
      pending = if (nAborted > 0) Some(opsNext) else None
      epoch += 1
    } else {
      pending = None
    }
    persistState(ops.limit(0))
  }

  /** One epoch per micro-batch: pending retries join the new arrivals.
    * A batch id at or below the persisted high-water mark is a post-crash
    * replay of work already folded into the committed state — skip it
    * (loudly: if the streaming checkpoint was deleted or moved while
    * `stateDir` was kept, batch ids restart at 0 and NEW data would match
    * this test — the warning is the operator's signal). The high-water
    * mark only advances if the epoch succeeds, so a failed batch retried
    * on this same instance is reprocessed, not dropped.
    */
  def processBatch(newOps: DataFrame, batchId: Long): Unit = synchronized {
    if (batchId <= lastBatchId) {
      AriaStream.log.warn(
        s"skipping micro-batch $batchId (state high-water mark $lastBatchId): " +
          "treated as a post-crash replay. If the streaming checkpoint was " +
          "reset while stateDir was kept, this batch holds NEW data — use a " +
          "fresh stateDir to reprocess.")
    } else atomically {
      lastBatchId = batchId
      step((pending match {
        case Some(p) => p.unionByName(newOps)
        case None => newOps
      }).localCheckpoint(true))
    }
  }

  /** After the stream ends: drain carried-over aborts to empty (the
    * reference's run-to-completion tail).
    */
  def drain(): Unit = synchronized {
    while (pending.isDefined) atomically(step(pending.get))
  }

  /** Wire an ops stream (tid, opidx, k, isUpdate rows) into this engine. */
  def writer(ops: DataFrame): DataStreamWriter[org.apache.spark.sql.Row] =
    ops.writeStream
      .outputMode("append")
      .foreachBatch((batch: DataFrame, id: Long) => processBatch(batch, id))
      .trigger(Trigger.AvailableNow())
}

object AriaStream {
  private val log = org.slf4j.LoggerFactory.getLogger(classOf[AriaStream])
}
