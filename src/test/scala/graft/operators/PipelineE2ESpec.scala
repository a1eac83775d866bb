package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** The training-data pipeline end to end: dedup-cluster the corpus, keep
  * canonical docs, stratified-sample them, pack the survivors into
  * fixed-token bins — each stage consumes the previous stage's DataFrame
  * (one lazy plan until the final action). What the per-operator oracles
  * can't show is that the operators COMPOSE; this pins it, plus the
  * conservation laws a composed run must satisfy.
  */
class PipelineE2ESpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("dedup -> stratified sample -> pack composes and conserves counts") {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val total = docs.count()

    // stage 1: canonical docs only (one survivor per near-dup cluster)
    val canonical = TextOps.dedupClusters(spark, dir)
      .filter($"is_canonical" === 1).select($"doc_id")
    val kept = docs.join(canonical, "doc_id")
    val nKept = kept.count()
    assert(nKept > 0 && nKept <= total)

    // stage 2: deterministic per-language downsample of the survivors —
    // the PRODUCTION predicate (Sketches.sampleHash/sampleRate), so a rate
    // or modulus change there is exercised here
    val sampled = kept.filter(Sketches.sampleHash < Sketches.sampleRate)
    val nSampled = sampled.count()
    assert(nSampled > 0 && nSampled < nKept)
    // determinism: the same predicate selects the same rows again
    assert(sampled.select($"doc_id").collect().map(_.getLong(0)).sorted
      .sameElements(kept.filter(Sketches.sampleHash < Sketches.sampleRate)
        .select($"doc_id").collect().map(_.getLong(0)).sorted))

    // stage 3: pack the sampled survivors with the PRODUCTION packer
    val binSize = 512L
    val packed = TextOps.packSequencesOf(sampled, binSize)

    // conservation: every sampled doc lands in exactly one bin
    assert(packed.count() == nSampled)
    assert(packed.select($"doc_id").distinct().count() == nSampled)
    val binStats = packed.groupBy($"source")
      .agg(min($"bin").as("lo"), max($"bin").as("hi"),
        countDistinct($"bin").as("n"))
      .collect()
    binStats.foreach { r =>
      assert(r.getLong(1) == 0L, s"${r.getString(0)}: first bin not 0")
    }
    // density holds only while every doc fits a bin (floor(cum/bin) skips
    // bins when one doc spans several) — assert it under its precondition
    // instead of baking the current corpus's doc lengths into the test
    val maxTokens = packed.agg(max($"n_tokens")).collect()(0).getLong(0)
    if (maxTokens <= binSize) binStats.foreach { r =>
      assert(r.getLong(3) == r.getLong(2) + 1,
        s"${r.getString(0)}: bins not dense")
    }
    // token conservation: bin sums add up to the sampled total
    val tokens = (length($"text")
      - length(regexp_replace($"text", lit(" "), lit(""))) + 1).cast("long")
    val sumTokens = packed.agg(sum($"n_tokens")).collect()(0).getLong(0)
    val directSum = sampled.select(tokens.as("t"))
      .agg(sum($"t")).collect()(0).getLong(0)
    assert(sumTokens == directSum)
  }
}
