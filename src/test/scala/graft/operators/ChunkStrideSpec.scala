package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** chunkStride (RAG sliding-window chunking): coverage, overlap, and
  * boundary laws against the raw token arrays.
  */
class ChunkStrideSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("chunkStride covers every token with stride-24 windows") {
    import spark.implicits._
    val ck = TextOps.chunkStride(spark, dir).localCheckpoint(true)
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", size(split($"text", " ")).cast("long").as("n"))
      .localCheckpoint(true)

    // chunk count per doc = ceil(n / 24)
    val cnt = ck.groupBy($"doc_id").agg(count(lit(1)).as("k"),
      max($"chunk_idx").as("mx"))
    val badCnt = cnt.join(docs, Seq("doc_id"))
      .filter($"k" =!= ceil($"n" / lit(24.0)).cast("long") ||
        $"mx" =!= $"k" - 1L)
    assert(badCnt.count() == 0)

    // offsets: st = 1 + 24*idx; window length law; coverage: the last
    // chunk reaches token n, every chunk ends at min(st+31, n)
    val bad = ck.join(docs, Seq("doc_id"))
      .filter($"st_token" =!= lit(1L) + lit(24L) * $"chunk_idx" ||
        $"n_tokens" =!= least(lit(32L), $"n" - $"st_token" + 1L) ||
        $"n_tokens" < 1L)
    assert(bad.count() == 0)
    val lastShort = ck.join(docs, Seq("doc_id"))
      .groupBy($"doc_id", $"n")
      .agg(max($"st_token" + $"n_tokens" - 1L).as("covered"))
      .filter($"covered" =!= $"n")
    assert(lastShort.count() == 0, "chunks must cover the full doc")

    // boundary words match the raw arrays
    val raw = Tables.documents(spark, dir)
      .select($"doc_id", split($"text", " ").as("arr"))
    val bw = ck.join(raw, Seq("doc_id"))
      .filter(element_at($"arr", $"st_token".cast("int")) =!= $"head_w" ||
        element_at($"arr",
          ($"st_token" + $"n_tokens" - 1L).cast("int")) =!= $"tail_w")
    assert(bw.count() == 0)
  }
}
