package graft.operators

import graft.SparkSpec
import graft.sources.Tables

/** hardNegatives: exact comparison against an independent driver-side
  * recomputation over the collected sf0.001 embeddings (same fixed-point
  * quantization, BigDecimal HALF_UP rounding) — validates the wrong-label
  * predicate and the ranking end to end.
  */
class HardNegativesSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("hardNegatives matches a driver-side exact reference") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", $"label".cast("long"),
        $"embedding".cast("array<double>"))
      .as[(Long, Long, Seq[Double])].collect()

    val q = emb.map { case (id, lab, v) =>
      (id, lab, v.map(x => math.floor(x * 10000d).toLong).toArray)
    }
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum.toDouble
      val r = d / (math.sqrt(a.map(x => x * x).sum.toDouble) *
        math.sqrt(b.map(x => x * x).sum.toDouble))
      BigDecimal(r).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = q.filter(_._1 < 10).sortBy(_._1).flatMap {
      case (qid, qlab, qv) =>
        q.filter { case (_, lab, _) => lab != qlab }
          .map { case (id, lab, v) => (id, lab, cos(v, qv)) }
          .sortBy { case (id, _, c) => (-c, id) }
          .take(3).zipWithIndex
          .map { case ((id, lab, c), i) => (qid, id, lab, c, i + 1) }
    }

    val got = Similarity.hardNegatives(spark, dir)
      .select($"qid", $"vec_id", $"neg_label", $"cos", $"rn".cast("int"))
      .as[(Long, Long, Long, Double, Int)].collect().toSeq
    assert(got == expected.toSeq)
  }
}
