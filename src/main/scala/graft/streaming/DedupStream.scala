package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Streaming near-duplicate detection: continuous corpus ingestion with
  * MinHash-LSH filtering against a persisted signature index — the
  * streaming counterpart of [[graft.operators.TextOps.incrementalPairsOf]]
  * (the batch delta-vs-corpus shape).
  *
  * The whole path is APPEND-MODE SAFE by construction:
  *  - signatures are per-row array expressions ([[TextOps.minhashSigCols]])
  *    — no groupBy, no state, no watermark needed to emit;
  *  - banding is a map + explode;
  *  - the candidate join is stream-static on (band, sig) against the
  *    corpus signature index (n_docs × 9 longs — the thing a production
  *    pipeline keeps in a `VersionedTable`, see IncrementalDedupSpec),
  *    with the same first-matching-band emission as the batch emitters,
  *    so no per-pair distinct and no stream-side state at all.
  *
  * Delta-vs-delta collisions inside the stream are intentionally out of
  * scope here (that is a stream-stream self-join requiring watermarked
  * state); the production loop handles them by folding each ingested
  * micro-batch into the index and letting the NEXT batch collide with it
  * — exactly what [[mergeIndex]] models.
  */
object DedupStream {

  /** (doc_id, mh0..mh7) signatures of a (doc_id, text) frame — works on
    * batch and streaming frames alike (map-only).
    */
  def signatures(docs: DataFrame): DataFrame =
    docs.select((col("doc_id") +: TextOps.minhashSigCols): _*)

  /** Streaming matches: every delta doc paired with the indexed corpus
    * docs whose LSH bands collide. `deltaDocs` may be a streaming
    * (doc_id, text) frame; `corpusSig` is the static signature index.
    * Emits (new_id, match_id), each pair exactly once
    * (first-matching-band). An id present on both sides never self-pairs
    * (re-submission guard, same contract as the batch helper).
    */
  def nearDupMatches(deltaDocs: DataFrame, corpusSig: DataFrame): DataFrame = {
    val d = TextOps.bandedOf(signatures(deltaDocs))
      .select(col("doc_id").as("new_id"), col("sig0").as("s0n"),
        col("band"), col("sig"))
    val c = TextOps.bandedOf(corpusSig)
      .select(col("doc_id").as("match_id"), col("sig0").as("s0c"),
        col("band"), col("sig"))
    d.join(c, Seq("band", "sig"))
      .filter(col("new_id") =!= col("match_id") &&
        (col("band") === 0 || col("s0n") =!= col("s0c")))
      .select(col("new_id"), col("match_id"))
  }

  /** Fold an ingested batch into the signature index (what a
    * foreachBatch sink does between micro-batches): last-writer-wins on
    * doc_id so re-submitted docs replace their old sketch.
    */
  def mergeIndex(corpusSig: DataFrame, batchSig: DataFrame): DataFrame =
    corpusSig.join(batchSig.select("doc_id"), Seq("doc_id"), "left_anti")
      .unionByName(batchSig)
}
