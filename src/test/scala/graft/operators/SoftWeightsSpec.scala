package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** softWeights (duplicate-aware soft reweighting): the weights must be the
  * exact 1/|cluster| permille floor of the cluster labeling they ride on,
  * and the corpus's total weight mass must behave like "one document's
  * worth per cluster".
  */
class SoftWeightsSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("softWeights is floor(1000/|cluster|) over the cluster labeling") {
    import spark.implicits._
    val w = TextOps.softWeights(spark, dir).localCheckpoint(true)
    val labels = TextOps.dedupClusters(spark, dir)
      .select($"doc_id", $"cluster").localCheckpoint(true)

    // one row per doc, docs conserved
    assert(w.count() == Tables.documents(spark, dir).count())
    assert(w.select($"doc_id").distinct().count() == w.count())

    // n_members matches the actual cluster size, weight is its permille floor
    val sizes = labels.groupBy($"cluster").agg(count(lit(1)).as("sz"))
    val bad = w.join(labels, Seq("doc_id", "cluster"), "left_anti")
    assert(bad.count() == 0, "every (doc, cluster) row matches the labeling")
    val mism = w.join(sizes, Seq("cluster"))
      .filter($"n_members" =!= $"sz" ||
        $"weight_permille" =!= floor(lit(1000L) / $"sz").cast("long"))
    assert(mism.count() == 0)

    // singletons keep full weight; every cluster's mass is ≤ 1000‰ and
    // within one floor-rounding unit per member of it
    val mass = w.groupBy($"cluster")
      .agg(sum($"weight_permille").as("m"), count(lit(1)).as("k"))
    assert(mass.filter($"m" > 1000L).count() == 0)
    assert(mass.filter($"m" <= lit(1000L) - $"k").count() == 0)
    val singles = mass.filter($"k" === 1)
    assert(singles.filter($"m" =!= 1000L).count() == 0)
  }
}
