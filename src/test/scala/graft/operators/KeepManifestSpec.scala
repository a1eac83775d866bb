package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** keepManifest: the end-to-end verdict must agree bit-for-bit with each
  * independently-verified component gate, and the composed keep must be
  * exactly their conjunction.
  */
class KeepManifestSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("manifest agrees with its three component gates and is their " +
      "conjunction") {
    import spark.implicits._
    val m = TextOps.keepManifest(spark, dir).localCheckpoint(true)

    // scope: exactly the training docs
    val train = Tables.documents(spark, dir).filter($"source" =!= "src0")
    assert(m.count() == train.count())
    assert(m.join(train, Seq("doc_id"), "left_anti").count() == 0)

    // keep is the conjunction, row by row
    assert(m.filter($"keep" =!=
      $"quality_keep" * $"is_keeper" * (lit(1) - $"contaminated"))
      .count() == 0)

    // component agreement
    val g = TextOps.gopherRules(spark, dir).select($"doc_id", $"keep".as("gk"))
    assert(m.join(g, Seq("doc_id")).filter($"quality_keep" =!= $"gk")
      .count() == 0)
    val d = TextOps.decontaminate(spark, dir)
      .select($"doc_id", $"contaminated".as("dc"))
    assert(m.join(d, Seq("doc_id")).filter($"contaminated" =!= $"dc")
      .count() == 0)
    val keepers = TextOps.keepBest(spark, dir).select($"keep_id".as("doc_id"))
      .withColumn("kb", lit(1))
    assert(m.join(keepers, Seq("doc_id"), "left")
      .filter($"is_keeper" =!= coalesce($"kb", lit(0))).count() == 0)

    // the pipeline must actually filter something and keep something
    val kept = m.filter($"keep" === 1).count()
    assert(kept > 0 && kept < m.count())
  }
}
