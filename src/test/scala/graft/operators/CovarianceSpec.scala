package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Value laws of the exact covariance numerator (Similarity.scala
  * covarianceMatrix): `cov_num(i,j) = n·Σqᵢqⱼ − Σqᵢ·Σqⱼ` on the gate
  * corpus must satisfy the algebraic properties a covariance matrix
  * cannot violate, and the full pipeline must agree with an
  * independently-computed dense accumulation on the same quantized
  * values (same numbers, different plan: driver-side fold vs the
  * mergeable explode→partial-agg shape).
  */
class CovarianceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val got: Map[(Long, Long), Long] =
    Similarity.covarianceMatrix(spark, sf("sf0.001"))
      .as[(Long, Long, Long)].collect()
      .map { case (i, j, c) => ((i, j), c) }.toMap

  test("upper triangle is complete and diagonals are non-negative") {
    assert(got.size === 64 * 65 / 2)
    for (i <- 0L until 64L)
      assert(got((i, i)) >= 0L, s"variance numerator negative at dim $i")
  }

  test("pipeline equals a dense driver-side accumulation") {
    val qs = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
      .select(transform(col("embedding"),
        x => floor(x.cast("double") * 10000d).cast("long")).as("q"))
      .as[Seq[Long]].collect()
    val d = 64
    val n = qs.length.toLong
    val sx = new Array[Long](d)
    val sxy = Array.ofDim[Long](d, d)
    qs.foreach { q =>
      var i = 0
      while (i < d) {
        sx(i) += q(i)
        var j = i
        while (j < d) { sxy(i)(j) += q(i) * q(j); j += 1 }
        i += 1
      }
    }
    for (i <- 0 until d; j <- i until d)
      assert(got((i.toLong, j.toLong)) === n * sxy(i)(j) - sx(i) * sx(j),
        s"mismatch at ($i,$j)")
  }

  test("cauchy-schwarz: cov_num(i,j)^2 <= cov_num(i,i) * cov_num(j,j)") {
    for (((i, j), c) <- got if i != j) {
      val vii = BigInt(got((i, i)))
      val vjj = BigInt(got((j, j)))
      assert(BigInt(c) * BigInt(c) <= vii * vjj, s"CS violated at ($i,$j)")
    }
  }
}
