package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.operators.Sketches

/** Streaming uniform sample: the bottom-k-by-hash reservoir maintained
  * across micro-batches — the streaming twin of the batch
  * `sample_reservoir` query and, unlike a classic Vitter reservoir, a
  * MERGEABLE one: "k smallest hash values per stratum" is a pure min-k
  * semilattice, so the maintained sample is BIT-IDENTICAL to the batch
  * query over the union for ANY slicing of the stream (the strongest
  * invariance a streaming sink can claim — FreqStream's MG summary only
  * gets bounds; this gets equality, the reason hash-reservoirs are the
  * production form).
  *
  * Work split: each micro-batch reduces to its per-stratum bottom-k via
  * one distributed window (≤ |strata|·k rows leave the executors); the
  * cross-batch fold is an O(|strata|·k) driver merge — the bounded-
  * sidecar pattern of the repo's other sinks. The hash MUST stay in
  * lockstep with the batch query's; the equality law in
  * SampleStreamSpec breaks loudly if either side's constants drift.
  */
object SampleStream {

  /** foreachBatch sink holding the per-lang bottom-k (hh, doc_id) sets. */
  class ReservoirSink(k: Int) extends Serializable {
    @volatile var state: Map[String, Vector[(Long, Long)]] = Map.empty

    def merge(batch: DataFrame, batchId: Long): Unit = synchronized {
      val local = batch
        .select($colLang, col("doc_id"),
          Sketches.h(col("doc_id"), 84631L, 24001L).as("hh"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("lang")).orderBy(col("hh"), col("doc_id"))))
        .filter(col("rk") <= k)
        .select(col("lang"), col("hh"), col("doc_id"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      var m = state
      local.groupBy(_._1).foreach { case (lang, rows) =>
        val merged = (m.getOrElse(lang, Vector.empty) ++
          rows.map(t => (t._2, t._3))).distinct.sorted.take(k)
        m = m.updated(lang, merged)
      }
      state = m
    }

    private def $colLang = col("lang")

    /** The sample as (lang, doc_id, hh) rows in the batch query's order. */
    def sample: Seq[(String, Long, Long)] =
      state.toSeq.sortBy(_._1).flatMap { case (lang, rows) =>
        rows.map { case (hh, id) => (lang, id, hh) }
      }
  }

  /** Writer folding a (lang, doc_id, ...) stream into `sink`. */
  def toReservoirSink(docs: DataFrame, sink: ReservoirSink)
      : DataStreamWriter[Row] =
    docs.writeStream
      .outputMode("append")
      .foreachBatch((batch: DataFrame, id: Long) => sink.merge(batch, id))
      .trigger(Trigger.AvailableNow())
}
