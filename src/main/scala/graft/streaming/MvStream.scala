package graft.streaming

import org.apache.hadoop.fs.Path
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
  *
  * Durability (StreamingDurabilitySpec): with `stateDir` set, every
  * successful fold commits (view, last batch id) as an atomically-renamed
  * parquet snapshot `stateDir/s=N` ([[graft.sources.AtomicDir]], the same
  * protocol as [[AriaStream]]); a new MvSink over the same `stateDir`
  * resumes the latest committed view, and a micro-batch replayed by the
  * streaming engine after a crash (id ≤ the persisted high-water mark) is
  * skipped — together with the source's `checkpointLocation` the fold is
  * exactly-once across driver failures. Without `stateDir`, state is
  * in-memory only.
  */
object MvStream {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** foreachBatch sink holding the maintained (key, n, s) view. */
  class MvSink(key: String, stateDir: Option[String] = None)
      extends Serializable {
    @volatile var state: Option[DataFrame] = None
    @volatile private var lastBatchId: Long = -1L
    @volatile private var stateVersion: Int = -1

    stateDir.foreach { dir =>
      val spark = org.apache.spark.sql.SparkSession.active
      graft.sources.AtomicDir.committed(spark, dir, "s=").lastOption
        .foreach { n =>
          val base = s"$dir/s=$n"
          state = Some(
            spark.read.parquet(s"$base/view").localCheckpoint(true))
          lastBatchId = spark.read.parquet(s"$base/meta")
            .collect().head.getLong(0)
          stateVersion = n
        }
    }

    private def persist(view: DataFrame): Unit = stateDir.foreach { dir =>
      val spark = view.sparkSession
      import spark.implicits._
      val n = stateVersion + 1
      graft.sources.AtomicDir.commit(spark, s"$dir/s=$n") { tmp =>
        view.write.parquet(s"$tmp/view")
        Seq(lastBatchId).toDF("last_batch_id")
          .coalesce(1).write.parquet(s"$tmp/meta")
      }
      stateVersion = n
      // best-effort retention of the last two snapshots (the fold has
      // durably succeeded once s=n committed; a sweep hiccup must not
      // fail the batch — same doctrine as AriaStream.persistState)
      try {
        val f = new Path(dir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        graft.sources.AtomicDir.committed(spark, dir, "s=").dropRight(2)
          .foreach(o => f.delete(new Path(s"$dir/s=$o"), true))
      } catch {
        case scala.util.control.NonFatal(t) =>
          log.warn(s"snapshot retention sweep failed under $dir " +
            "(stale snapshots remain; next commit retries the sweep)", t)
      }
    }

    def merge(batch: DataFrame, batchId: Long): Unit = synchronized {
      if (batchId <= lastBatchId) {
        log.warn(s"skipping micro-batch $batchId (state high-water mark " +
          s"$lastBatchId): treated as a post-crash replay. If the " +
          "streaming checkpoint was reset while stateDir was kept, this " +
          "batch holds NEW data — use a fresh stateDir to reprocess.")
        return
      }
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
        .localCheckpoint(true)
      // all-or-nothing: the high-water mark and snapshot only advance
      // once the fold (and its commit) succeeded, so a failed batch
      // retried on this instance reprocesses instead of dropping
      val b0 = lastBatchId
      lastBatchId = batchId
      try persist(next)
      catch { case t: Throwable => lastBatchId = b0; throw t }
      state = Some(next)
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
