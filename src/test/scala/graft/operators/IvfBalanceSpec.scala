package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** ivfBalance: conserves the corpus, agrees with the assignment's own
  * per-cell counts, and permille shares floor-sum to ≈1000.
  */
class IvfBalanceSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("ivfBalance conserves vectors and matches assignment counts") {
    import spark.implicits._
    val bal = Similarity.ivfBalance(spark, dir).localCheckpoint(true)
    val nVecs = Tables.embeddings(spark, dir).count()
    assert(bal.agg(sum($"n_vec")).head().getLong(0) == nVecs)
    // floor-permille shares: sum in (1000 - nCells, 1000]
    val shareSum = bal.agg(sum($"share_pm")).head().getLong(0)
    val cells = bal.count()
    assert(shareSum <= 1000 && shareSum > 1000 - cells,
      s"share sum $shareSum over $cells cells")
    // agrees with the assignment frame's own counts
    val fromAssign = Similarity.ivfAssign(spark, dir)
      .groupBy($"centroid").agg(count(lit(1)).as("n2"))
    assert(bal.join(fromAssign, "centroid")
      .filter($"n_vec" =!= $"n2").count() == 0)
    assert(bal.count() == fromAssign.count())
  }
}
