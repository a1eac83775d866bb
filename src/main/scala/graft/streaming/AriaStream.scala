package graft.streaming

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
  */
class AriaStream(
    table0: DataFrame,
    reorder: Boolean,
    valueCols: Seq[String],
    newValue: (Column, Column) => Column) extends Serializable {

  @volatile var table: DataFrame = table0.localCheckpoint(true)
  @volatile var pending: Option[DataFrame] = None
  @volatile var epoch: Int = 1
  @volatile var history: Vector[(Int, Long, Long)] = Vector.empty

  /** One epoch over `ops`: decide, install, record history, carry aborts. */
  private def step(ops: DataFrame): Unit = {
    val nTxns = ops.select("tid").distinct().count()
    if (nTxns > 0) {
      val (next, _, aborted) = AriaEngine.runEpoch(
        table, ops, reorder, valueCols, newValue, epoch)
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
  }

  /** One epoch per micro-batch: pending retries join the new arrivals. */
  def processBatch(newOps: DataFrame, batchId: Long): Unit = synchronized {
    step((pending match {
      case Some(p) => p.unionByName(newOps)
      case None => newOps
    }).localCheckpoint(true))
  }

  /** After the stream ends: drain carried-over aborts to empty (the
    * reference's run-to-completion tail).
    */
  def drain(): Unit = synchronized {
    while (pending.isDefined) step(pending.get)
  }

  /** Wire an ops stream (tid, opidx, k, isUpdate rows) into this engine. */
  def writer(ops: DataFrame): DataStreamWriter[org.apache.spark.sql.Row] =
    ops.writeStream
      .outputMode("append")
      .foreachBatch((batch: DataFrame, id: Long) => processBatch(batch, id))
      .trigger(Trigger.AvailableNow())
}
