package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** domainCap: the manifest conserves the corpus, per-source kept counts
  * equal min(cap, source size), and ranks are a permutation within source.
  */
class DomainCapSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("domainCap keeps at most 10 best docs per source, manifest-complete") {
    import spark.implicits._
    val m = Sketches.domainCap(spark, dir).localCheckpoint(true)
    val docs = Tables.documents(spark, dir)
    // one manifest row per document
    assert(m.count() == docs.count())
    assert(m.select($"doc_id").distinct().count() == docs.count())
    // kept counts per source = min(10, |source|)
    val bad = m.groupBy($"source")
      .agg(sum($"kept").as("k"), count(lit(1)).as("n"))
      .filter($"k" =!= least($"n", lit(10L)))
    assert(bad.count() == 0)
    // ranks are 1..n within each source
    val rk = m.groupBy($"source")
      .agg(sum($"rnk").as("s"), count(lit(1)).as("n"))
      .filter($"s" =!= $"n" * ($"n" + 1) / 2)
    assert(rk.count() == 0)
    // kept docs are at least as long as every dropped doc of the same
    // source (best-first ordering law)
    val kept = m.filter($"kept" === 1L)
      .groupBy($"source").agg(min($"n_chars").as("minKept"))
    val drop = m.filter($"kept" === 0L)
      .groupBy($"source").agg(max($"n_chars").as("maxDrop"))
    assert(kept.join(drop, "source")
      .filter($"maxDrop" > $"minKept").count() == 0)
  }
}
