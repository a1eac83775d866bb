package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Laws of the exact rank-sum AUC (TextOps.aucRankSum's fold, exercised
  * directly on crafted score/label frames): perfect separation → 1000‰,
  * perfect inversion → 0‰, all-tied scores → exactly 500‰, and the
  * half-credit tie rule against a hand-computed mixed case.
  */
class AucSpec extends SparkSpec {
  import spark.implicits._

  /** The same fold as TextOps.aucRankSum, over an explicit (y, score). */
  private def auc(rows: Seq[(Long, Long)]): (Long, Long, Long, Long) = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val df: DataFrame = rows.toDF("y", "score")
      .groupBy($"score")
      .agg(sum($"y").as("pos"), (count(lit(1)) - sum($"y")).as("neg"))
      .withColumn("nb", coalesce(sum($"neg").over(w), lit(0L)))
      .agg(sum($"pos").as("n_pos"), sum($"neg").as("n_neg"),
        sum($"pos" * (lit(2L) * $"nb" + $"neg")).as("u2"))
      .select($"n_pos", $"n_neg", $"u2",
        expr("(1000 * u2) div (2 * n_pos * n_neg)").as("auc_pm"))
    df.as[(Long, Long, Long, Long)].head()
  }

  test("perfect separation scores 1000 permille") {
    val rows = (1L to 5L).map(i => (0L, i)) ++ (6L to 10L).map(i => (1L, i))
    assert(auc(rows) === ((5L, 5L, 50L, 1000L)))
  }

  test("perfect inversion scores 0") {
    val rows = (1L to 5L).map(i => (1L, i)) ++ (6L to 10L).map(i => (0L, i))
    assert(auc(rows) === ((5L, 5L, 0L, 0L)))
  }

  test("all-tied scores land exactly at 500 (u2 = n_pos * n_neg)") {
    val rows = Seq.fill(4)((1L, 7L)) ++ Seq.fill(6)((0L, 7L))
    assert(auc(rows) === ((4L, 6L, 24L, 500L)))
  }

  test("mixed ties match the hand-computed half-credit rank-sum") {
    // scores: pos at {3, 5, 5}, neg at {3, 4, 6}
    // pairs (p,n): (3,3) tie=1 ; (3,4),(3,6) lose=0 ; (5,3),(5,4) win=2
    // (5,6) lose ; second 5: same → U = 0.5 + 2 + 2 = 4.5, u2 = 9
    // auc = 4.5 / 9 = 0.5 exactly
    val rows = Seq((1L, 3L), (1L, 5L), (1L, 5L),
      (0L, 3L), (0L, 4L), (0L, 6L))
    assert(auc(rows) === ((3L, 3L, 9L, 500L)))
  }
}
