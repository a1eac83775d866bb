package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Laws of k-NN label propagation (sim_label_prop): an independent
  * in-memory replay of the 3 clamped synchronous rounds over the SAME
  * edge set, conservation of the eval set, and monotone label coverage
  * (a vector labeled in round r stays labeled — clamped nodes never
  * change, unlabeled nodes only ever gain or swap a label).
  */
class LabelPropSpec extends SparkSpec {
  import spark.implicits._

  private val dir = sf("sf0.001")

  test("confusion matches an in-memory replay of the clamped rounds") {
    val edges = Similarity.knnGraph(spark, dir)
      .select($"vec_id", $"nbr").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val truth = Tables.embeddings(spark, dir)
      .select($"vec_id", $"label".cast("long")).as[(Long, Long)]
      .collect().toMap
    var cur: Map[Long, Option[Long]] = truth.map { case (v, l) =>
      v -> (if (v >= 100L) Some(l) else None)
    }
    for (_ <- 1 to 3) {
      val next = cur.map { case (v, c) =>
        if (v >= 100L) v -> c
        else {
          val votes = edges.getOrElse(v, Seq.empty)
            .flatMap(n => cur(n)).groupBy(identity)
            .map { case (l, xs) => (l, xs.size) }.toSeq
          val maj = votes.sortBy { case (l, n) => (-n, l) }.headOption
          v -> maj.map(_._1).orElse(c)
        }
      }
      cur = next
    }
    val expect = truth.keys.filter(_ < 100L).toSeq
      .map(v => (truth(v), cur(v).getOrElse(-1L)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Similarity.labelProp(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === expect)
    assert(got.values.sum === 100L)
    // non-vacuity: propagation actually labeled most of the eval set.
    // Accuracy itself is DATA, not a law — on this synthetic corpus the
    // bucketed 3-NN carries weak label signal (measured 11/84 ≈ 13% vs
    // 10% chance over 10 labels), which is exactly what the confusion
    // report exists to surface; the gate checks the machinery.
    val labeled = got.filter(_._1._2 >= 0L).values.sum
    assert(labeled > 50L)
  }
}
