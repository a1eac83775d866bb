package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.functions.MisraGries

/** Streaming heavy hitters: a Misra–Gries summary maintained across
  * micro-batches — the streaming twin of the batch `freq_heavy_hitters`
  * query and the form a 100 TB ingest monitor actually runs (per-token
  * exact counting over an unbounded stream is unbounded state; the MG
  * summary is k entries, forever).
  *
  * Work split, by design: ALL corpus-sized work happens inside the
  * distributed [[MisraGries]] aggregate (partial summaries per
  * partition, ≤k entries each, merged by Spark — the only exchange a
  * batch pays ships ≤ partitions×k map entries); the cross-batch fold
  * here is O(k) driver arithmetic on a ≤2k-entry map, the same
  * bounded-sidecar pattern as the repo's other streaming sinks. The
  * fold is the Agarwal et al. (PODS'12, "Mergeable Summaries") MG
  * merge: sum counters, then subtract the (k+1)-th largest counter from
  * every entry and drop the non-positive — which keeps ≤k entries and
  * preserves the summary guarantees ACROSS ANY SLICING of the stream
  * and any partial-merge order:
  *
  *  - every estimate undercounts: est(w) ≤ true(w);
  *  - the undercount is bounded: true(w) − est(w) ≤ n/(k+1) over n
  *    processed tokens (for absent words est(w) = 0);
  *  - hence NO FALSE DISMISSAL: every word with true(w) > n/(k+1) is
  *    in the summary.
  *
  * Candidate-set bit-identity across slicings is deliberately NOT
  * claimed — MG contents are merge-order-dependent (the class-level
  * property spec covers this); the three bounds above are what the
  * sketch contracts, and FreqStreamSpec checks them under random
  * slicings.
  */
object FreqStream {

  /** foreachBatch sink holding the ≤k-entry summary and the token count. */
  class FreqSink(k: Int) extends Serializable {
    @volatile var state: Map[String, Long] = Map.empty
    @volatile var processed: Long = 0L

    def merge(batch: DataFrame, batchId: Long): Unit = synchronized {
      val r: Row = batch.agg(count(lit(1)).as("n"),
        MisraGries.misraGries(col("w"), k).as("mg")).head()
      processed += r.getLong(0)
      var m = state
      r.getAs[Map[String, Long]](1).foreach { case (w, c) =>
        m = m.updated(w, m.getOrElse(w, 0L) + c)
      }
      if (m.size > k) {
        // (k+1)-th largest counter; subtracting it zeroes at least the
        // k+1 smallest entries, so at most k survive
        val d = m.values.toSeq.sorted(Ordering[Long].reverse)(k)
        m = m.flatMap { case (w, c) =>
          if (c - d > 0L) Some(w -> (c - d)) else None
        }
      }
      state = m
    }

    /** Summary entries, largest first (deterministic tie-break). */
    def candidates: Seq[(String, Long)] =
      state.toSeq.sortBy(t => (-t._2, t._1))

    /** The guaranteed heavy hitters right now: words whose TRUE count
      * provably exceeds n/(k+1) (est alone already clears the bar).
      */
    def guaranteed: Seq[(String, Long)] =
      candidates.filter(_._2 * (k + 1) > processed)
  }

  /** Writer folding a token stream (column `w`) into `sink`. */
  def toFreqSink(tokens: DataFrame, sink: FreqSink): DataStreamWriter[Row] =
    tokens.writeStream
      .outputMode("append")
      .foreachBatch((batch: DataFrame, id: Long) => sink.merge(batch, id))
      .trigger(Trigger.AvailableNow())
}
