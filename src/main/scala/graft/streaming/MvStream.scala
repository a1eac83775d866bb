package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.operators.Materialized

/** Streaming incremental view maintenance: a CDC stream of signed row
  * changes (`op` = +1 insert / −1 delete) folds into a count/sum view via
  * [[Materialized.foldCountSum]] once per micro-batch — the streaming
  * twin of the batch `mv_incremental_*` family and the way a 100 TB
  * rollup actually stays fresh (the view never rebuilds; each trigger
  * pays O(|batch| + |view|)).
  *
  * Correctness contract (MvStreamSpec): because the counting rule is
  * associative over deltas — refresh(refresh(V, Δ₁), Δ₂) =
  * refresh(V, Δ₁ ⊎ Δ₂) — the final view is INVARIANT to how the CDC
  * stream is sliced into micro-batches, and equals the from-scratch
  * aggregate of the net effective rows. Deletes may arrive in an earlier
  * micro-batch than their insert (out-of-order CDC): intermediate views
  * can then hold transient negative counts for the affected key, so the
  * count-0 group-death filter is applied at READ time ([[MvSink.view]]),
  * not inside the fold — filtering mid-fold would discard the negative
  * carry and break batch-split invariance.
  */
object MvStream {

  /** foreachBatch sink holding the maintained (key, n, s) view. */
  class MvSink(key: String) extends Serializable {
    @volatile var state: Option[DataFrame] = None

    def merge(batch: DataFrame, batchId: Long): Unit = synchronized {
      val ins = batch.filter(col("op") > 0).select(col(key), col("x"))
      val del = batch.filter(col("op") < 0).select(col(key), col("x"))
      val prev = state.getOrElse {
        batch.sparkSession.createDataFrame(
          new java.util.ArrayList[Row](),
          org.apache.spark.sql.types.StructType(Seq(
            batch.schema(key),
            org.apache.spark.sql.types.StructField("n",
              org.apache.spark.sql.types.LongType, nullable = false),
            org.apache.spark.sql.types.StructField("s",
              org.apache.spark.sql.types.LongType, nullable = false))))
      }
      // keep transient zero/negative groups in the carried state (see
      // class doc); the public accessor applies the death filter
      val next = Materialized.foldCountSum(prev, ins, del, key)
      state = Some(next.localCheckpoint(true))
    }

    /** The maintained view: groups alive (n > 0) right now. */
    def view: Option[DataFrame] = state.map(_.filter(col("n") > 0L))
  }

  /** Writer folding a CDC stream (key, x, op) into `sink`. */
  def toMvSink(cdc: DataFrame, sink: MvSink): DataStreamWriter[Row] =
    cdc.writeStream
      .outputMode("append")
      .foreachBatch((batch: DataFrame, id: Long) => sink.merge(batch, id))
      .trigger(Trigger.AvailableNow())
}
