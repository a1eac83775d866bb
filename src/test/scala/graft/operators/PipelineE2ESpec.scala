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

  test("fragmentation sweep: exact recount, monotone in context length") {
    import spark.implicits._
    val got = TextOps.packFragmentation(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) === Seq(128L, 256L, 512L, 1024L, 2048L))
    // independent in-memory recount from the raw docs
    val raw = Tables.documents(spark, dir)
      .select($"source", $"doc_id",
        (size(split($"text", " "))).cast("long").as("t"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    got.foreach { case (l, nd, nb, split, cuts, pm) =>
      var (eNd, eNb, eSplit, eCuts) = (0L, 0L, 0L, 0L)
      raw.values.foreach { ts =>
        var start = 0L
        var hi = 0L
        ts.foreach { t =>
          val (b0, b1) = (start / l, (start + t - 1) / l)
          eNd += 1; if (b1 > b0) eSplit += 1
          eCuts += b1 - b0; hi = b1
          start += t
        }
        eNb += hi + 1
      }
      assert((nd, nb, split, cuts) === ((eNd, eNb, eSplit, eCuts)), s"L=$l")
      assert(pm === 1000L * split / nd, s"L=$l")
    }
    // power-of-two grid: larger-L boundaries are a subset of smaller-L
    // boundaries, so splits/cuts/bins are all monotone nonincreasing
    got.sliding(2).foreach { case Seq(a, b) =>
      assert(b._3 <= a._3 && b._4 <= a._4 && b._5 <= a._5)
    case _ => }
    // non-vacuous at this corpus: the smallest context actually splits
    assert(got.head._4 > 0L)
  }
}
