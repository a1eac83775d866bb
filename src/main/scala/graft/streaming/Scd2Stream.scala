package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** Streaming SCD Type-2 maintenance: an ordered per-key change log
  * (user_id, ts, event_id, event_type) arriving in micro-batches keeps
  * the Kimball dimension of [[graft.operators.Events.scd2Build]] fresh
  * without ever rebuilding it — the Delta-MERGE SCD2 pattern, expressed
  * as pure keyed DataFrame ops.
  *
  * Per micro-batch the work is O(|batch| + |touched users' open rows|):
  *  1. the batch alone is run-compressed per user (user-keyed window on
  *     batch-sized data);
  *  2. each touched user's single OPEN version either ABSORBS the
  *     batch's first run (same state continues across the batch
  *     boundary — no version split) or CLOSES at the first run's
  *     valid_from;
  *  3. remaining runs append with version numbers offset by the user's
  *     open version; CLOSED rows and untouched users carry forward
  *     unmodified (union + anti upsert, per the iterative-state law),
  *     and the state is checkpointed once per batch.
  *
  * Correctness contract (Scd2StreamSpec): provided each key's events
  * arrive in (ts, event_id) order across batches — the defining property
  * of a CDC/change log; slicing is otherwise arbitrary — the maintained
  * dimension is BIT-IDENTICAL to the batch rebuild over all events seen
  * so far, for any number of batches.
  */
object Scd2Stream {

  /** Run-compress one batch: (user_id, lv, state, valid_from, valid_to)
    * with lv the batch-local version number; the batch's last run per
    * user has valid_to null.
    */
  private def localRuns(batch: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    batch
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("state"))
      .withColumn("changed",
        lag(col("state"), 1).over(byUser).isNull ||
          lag(col("state"), 1).over(byUser) =!= col("state"))
      .filter(col("changed"))
      .withColumn("lv", row_number().over(Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))).cast("long"))
      .withColumn("valid_to", lead(col("ts"), 1)
        .over(Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))))
      .select(col("user_id"), col("lv"), col("state"),
        col("ts").as("valid_from"), col("valid_to"))
  }

  private val dimCols = Seq("user_id", "version_no", "state",
    "valid_from", "valid_to", "is_current").map(col)

  /** foreachBatch sink holding the maintained SCD2 dimension. */
  class Scd2Sink extends Serializable {
    @volatile var state: Option[DataFrame] = None

    def merge(batch: DataFrame, batchId: Long): Unit = synchronized {
      if (batch.isEmpty) return
      val runs = localRuns(batch).localCheckpoint(true)
      val next = state match {
        case None =>
          runs.select(col("user_id"), col("lv").as("version_no"),
            col("state"), col("valid_from"), col("valid_to"),
            col("valid_to").isNull.as("is_current"))
        case Some(prev) =>
          val first = runs.filter(col("lv") === 1L)
            .select(col("user_id"), col("state").as("fstate"),
              col("valid_from").as("fvf"), col("valid_to").as("fvt"))
          val open = prev.filter(col("is_current"))
          // per touched user: the open row (if any), whether it absorbs
          // the batch's first run, and the version-number offset
          val info = first.join(
              open.select(col("user_id"), col("version_no").as("ovno"),
                col("state").as("ostate"), col("valid_from").as("ovf")),
              Seq("user_id"), "left")
            .withColumn("absorb",
              col("ovno").isNotNull && col("ostate") === col("fstate"))
            .withColumn("offset", coalesce(col("ovno"), lit(0L)) -
              when(col("absorb"), 1L).otherwise(0L))
          val revisedOpen = info.filter(col("ovno").isNotNull).select(
            col("user_id"), col("ovno").as("version_no"),
            col("ostate").as("state"), col("ovf").as("valid_from"),
            when(col("absorb"), col("fvt")).otherwise(col("fvf"))
              .as("valid_to"),
            (col("absorb") && col("fvt").isNull).as("is_current"))
          val newRows = runs
            .join(info.select(col("user_id"), col("absorb"), col("offset")),
              Seq("user_id"))
            .filter(!col("absorb") || col("lv") > 1L)
            .select(col("user_id"), (col("lv") + col("offset"))
              .as("version_no"), col("state"), col("valid_from"),
              col("valid_to"), col("valid_to").isNull.as("is_current"))
          val openUntouched = open.join(first.select(col("user_id")),
            Seq("user_id"), "left_anti")
          prev.filter(!col("is_current")).select(dimCols: _*)
            .unionByName(openUntouched.select(dimCols: _*))
            .unionByName(revisedOpen.select(dimCols: _*))
            .unionByName(newRows.select(dimCols: _*))
      }
      state = Some(next.localCheckpoint(true))
    }

    /** The maintained dimension. */
    def dim: Option[DataFrame] = state
  }

  /** Writer folding an event stream into `sink`. */
  def toScd2Sink(events: DataFrame, sink: Scd2Sink): DataStreamWriter[Row] =
    events.writeStream
      .outputMode("append")
      .foreachBatch((batch: DataFrame, id: Long) => sink.merge(batch, id))
      .trigger(Trigger.AvailableNow())
}
