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

    // stage 2: deterministic per-language downsample of the survivors
    val rate = when($"lang" === "en", 100L)
      .when($"lang" === "de", 300L).otherwise(500L)
    val hv = (($"doc_id" * 131071L + $"n_chars" * 8191L) % 2147483647L) % 1000L
    val sampled = kept.filter(hv < rate)
    val nSampled = sampled.count()
    assert(nSampled > 0 && nSampled < nKept)
    // determinism: the same predicate selects the same rows again
    assert(sampled.select($"doc_id").collect().map(_.getLong(0)).sorted
      .sameElements(kept.filter(hv < rate).select($"doc_id")
        .collect().map(_.getLong(0)).sorted))

    // stage 3: pack the sampled survivors into 512-token bins per source
    import org.apache.spark.sql.expressions.Window
    val tokens = (length($"text")
      - length(regexp_replace($"text", lit(" "), lit(""))) + 1).cast("long")
    val w = Window.partitionBy($"source").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val packed = sampled
      .select($"source", $"doc_id", tokens.as("n_tokens"))
      .withColumn("bin",
        floor(coalesce(sum($"n_tokens").over(w), lit(0L)) / 512.0).cast("long"))

    // conservation: every sampled doc lands in exactly one bin
    assert(packed.count() == nSampled)
    assert(packed.select($"doc_id").distinct().count() == nSampled)
    // bins are dense per source, starting at 0
    val binStats = packed.groupBy($"source")
      .agg(min($"bin").as("lo"), max($"bin").as("hi"),
        countDistinct($"bin").as("n"))
      .collect()
    binStats.foreach { r =>
      assert(r.getLong(1) == 0L, s"${r.getString(0)}: first bin not 0")
      assert(r.getLong(3) == r.getLong(2) + 1,
        s"${r.getString(0)}: bins not dense")
    }
    // token conservation: bin sums add up to the sampled total
    val sumTokens = packed.agg(sum($"n_tokens")).collect()(0).getLong(0)
    val directSum = sampled.select(tokens.as("t"))
      .agg(sum($"t")).collect()(0).getLong(0)
    assert(sumTokens == directSum)
  }
}
