package graft.operators

import graft.SparkSpec
import graft.sources.Tables

/** nearestCentroid / rangeSearch: exact driver-side recomputation over the
  * collected sf0.001 embeddings (same fixed-point quantization and
  * floor-mean centroids), plus the structural laws each contract promises.
  */
class CentroidRangeSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  private def quantized(): Array[(Long, Long, Array[Long])] = {
    import spark.implicits._
    Tables.embeddings(spark, dir)
      .select($"vec_id", $"label".cast("long"),
        $"embedding".cast("array<double>"))
      .as[(Long, Long, Seq[Double])].collect()
      .map { case (id, lab, v) =>
        (id, lab, v.map(x => math.floor(x * 10000d).toLong).toArray)
      }
  }

  test("nearestCentroid confusion matrix matches a driver-side exact " +
      "reference and conserves the corpus") {
    val q = quantized()
    val dims = q.head._3.length
    val cent = q.groupBy(_._2).map { case (lab, vs) =>
      lab -> Array.tabulate(dims) { d =>
        val col = vs.map(_._3(d))
        math.floor(col.sum.toDouble / col.length).toLong
      }
    }
    val pred = q.map { case (_, lab, v) =>
      val best = cent.toSeq.map { case (clab, m) =>
        val dist = v.indices.map { d =>
          val df = v(d) - m(d); df * df
        }.sum
        (dist, clab)
      }.min
      (lab, best._2)
    }
    val expect = pred.groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val got = Similarity.nearestCentroid(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expect)
    // every vector lands in exactly one confusion cell
    assert(got.values.sum == q.length)
    // prototypes must recover their own structure well above the 1/|labels|
    // = 0.1 chance rate (measured 0.366 on this 500-vector corpus — the
    // classes overlap, which is exactly what this probe exists to expose)
    val correct = got.collect { case ((t, p), n) if t == p => n }.sum
    assert(correct.toDouble / q.length > 0.2)
  }

  test("rangeSearch returns exactly the vectors within the radius, " +
      "variable counts per query") {
    val q = quantized()
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum.toDouble
      val r = d / (math.sqrt(a.map(x => x * x).sum.toDouble) *
        math.sqrt(b.map(x => x * x).sum.toDouble))
      BigDecimal(r).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expect = q.filter(_._1 < 10).flatMap { case (qid, _, qv) =>
      q.filter(_._1 != qid).map { case (id, _, v) => (qid, id, cos(qv, v)) }
        .filter(_._3 >= 0.30)
    }.toSet
    val got = Similarity.rangeSearch(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expect)
    assert(got.nonEmpty)
    // the radius contract: result sizes are data-defined, not k-truncated —
    // on real data at least two queries must disagree on hit count
    val counts = got.groupBy(_._1).view.mapValues(_.size).values.toSet
    assert(counts.size > 1)
  }
}
