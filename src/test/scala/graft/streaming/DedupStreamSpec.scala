package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TextOps
import graft.sources.Tables

/** DedupStream: the stateless per-row signature must be bit-identical to
  * the batch groupBy signature, and the streaming delta-vs-index matches
  * must converge to the batch incremental operator's corpus-side pairs.
  */
class DedupStreamSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("per-row signatures equal the batch minhash signatures") {
    import spark.implicits._
    val fromRows = DedupStream.signatures(
      Tables.documents(spark, dir).select($"doc_id", $"text"))
    val batch = TextOps.minhash(spark, dir)
    assert(fromRows.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(fromRows).count() == 0)
  }

  test("streaming matches converge to the batch incremental pairs") {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
    val isNew = $"doc_id" % 5 === 4
    // static index: corpus-side signatures
    val corpusSig = DedupStream.signatures(docs.filter(!isNew))
      .localCheckpoint(true)
    // stage the delta as several files -> several micro-batches
    val staging = Files.createTempDirectory("graft-delta").toFile.getAbsolutePath
    docs.filter(isNew).repartition(3).write.mode("overwrite").parquet(staging)
    val schema = spark.read.parquet(staging).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(staging)

    val q = DedupStream.nearDupMatches(stream, corpusSig)
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_stream_out").start()
    q.processAllAvailable(); q.stop()

    val got = spark.table("dedup_stream_out").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch reference: the corpus-side rows of the incremental operator
    val want = TextOps.incrementalPairsOf(
        DedupStream.signatures(docs.filter(!isNew)),
        DedupStream.signatures(docs.filter(isNew)))
      .filter($"match_src" === "corpus")
      .select($"new_id", $"match_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    assert(got.nonEmpty, "no matches — the staged delta never collided")
  }

  test("withinStreamMatches pairs same-batch near-dups exactly once and " +
      "converges to the batch delta-vs-delta pairs") {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
    val isNew = $"doc_id" % 5 === 4
    val delta = docs.filter(isNew)
      .withColumn("ingest_ts", to_timestamp(lit("2026-01-01 00:00:00")))
    // batch reference: the delta-vs-delta side of the incremental operator
    val want = TextOps.incrementalPairsOf(
        DedupStream.signatures(docs.filter(!isNew)),
        DedupStream.signatures(docs.filter(isNew)))
      .filter($"match_src" === "delta")
      .select($"new_id", $"match_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(want.nonEmpty, "gate delta has no internal near-dups")
    assert(want.length == want.distinct.length)

    // ALL delta docs in ONE staged file -> one micro-batch: every pair is
    // a same-batch collision, the exact case the stream-static path missed
    val staging = Files.createTempDirectory("graft-wb").toFile.getAbsolutePath
    delta.coalesce(1).write.mode("overwrite").parquet(staging)
    val schema = spark.read.parquet(staging).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(staging)
    val q = DedupStream.withinStreamMatches(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_wb_out").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("dedup_wb_out").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.distinct.length,
      "a pair was emitted more than once")
    assert(got.sorted.toSeq == want.sorted.toSeq)

    // staged as several files -> several micro-batches within the
    // horizon: cross-batch pairs must still surface, and still only once
    val staging2 = Files.createTempDirectory("graft-wb2").toFile.getAbsolutePath
    delta.repartition(3).write.mode("overwrite").parquet(staging2)
    val stream2 = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(staging2)
    val q2 = DedupStream.withinStreamMatches(stream2)
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_wb_out2").start()
    q2.processAllAvailable(); q2.stop()
    val got2 = spark.table("dedup_wb_out2").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got2.length == got2.distinct.length)
    assert(got2.sorted.toSeq == want.sorted.toSeq)
  }

  test("mergeIndex is last-writer-wins and grows the index by new ids") {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
    val base = DedupStream.signatures(docs.filter($"doc_id" < 100))
    // re-submit docs 50..99 with DIFFERENT text (shifted ids' text) and
    // add docs 100..149
    val resub = DedupStream.signatures(
      docs.filter($"doc_id" >= 150 && $"doc_id" < 200)
        .select(($"doc_id" - 100).as("doc_id"), $"text"))
    val fresh = DedupStream.signatures(
      docs.filter($"doc_id" >= 100 && $"doc_id" < 150))
    val merged = DedupStream.mergeIndex(base, resub.unionByName(fresh))
      .localCheckpoint(true)
    // 50 untouched base ids + 50 re-submitted + 50 fresh, one row per id
    assert(merged.count() == 150)
    assert(merged.select($"doc_id").distinct().count() == 150)
    // re-submitted ids carry the NEW sketch, not the base one
    assert(resub.exceptAll(merged).count() == 0)
    assert(merged.exceptAll(resub).count() == 100)
  }
}
