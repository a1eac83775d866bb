package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** keepBest (canonical-document selection): the survivor manifest must
  * satisfy the laws a dedup action implies, checked against the cluster
  * labeling it rides on — not just row counts.
  */
class KeepBestSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("keepBest picks the max-words member per cluster and conserves docs") {
    import spark.implicits._
    val manifest = TextOps.keepBest(spark, dir).localCheckpoint(true)
    val labels = TextOps.dedupClusters(spark, dir)
      .select($"doc_id", $"cluster").localCheckpoint(true)
    val total = Tables.documents(spark, dir).count()

    // one row per cluster; membership conserved
    assert(manifest.select($"cluster").distinct().count() == manifest.count())
    assert(manifest.agg(sum($"n_members")).collect()(0).getLong(0) == total)
    assert(manifest.count() == labels.select($"cluster").distinct().count())

    // keep_id is a member of its own cluster
    val orphan = manifest.join(labels,
      manifest("keep_id") === labels("doc_id") &&
        manifest("cluster") === labels("cluster"), "left_anti")
    assert(orphan.count() == 0)

    // keep_words is the cluster max, and keep_id is the smallest doc_id
    // among members attaining it (merit first, deterministic tie-break)
    val words = Tables.documents(spark, dir).select($"doc_id",
      (length($"text") - length(regexp_replace($"text", lit(" "), lit(""))) + 1)
        .cast("long").as("n_words"))
    val best = labels.join(words, "doc_id")
      .groupBy($"cluster").agg(max($"n_words").as("max_words"))
    val atMax = labels.join(words, "doc_id")
      .join(best, "cluster")
      .filter($"n_words" === $"max_words")
      .groupBy($"cluster").agg(min($"doc_id").as("expect_id"),
        min($"n_words").as("expect_words"))
    val mismatch = manifest.join(atMax, "cluster")
      .filter($"keep_id" =!= $"expect_id" || $"keep_words" =!= $"expect_words")
    assert(mismatch.count() == 0)
  }
}
