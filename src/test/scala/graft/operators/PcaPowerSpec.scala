package graft.operators

import graft.SparkSpec

/** emb_pca_power: the distributed fixed-point power iteration recounts
  * from a serial BigInt simulation (same shift, same rescale divisor,
  * same sign-factored floors), and the last two iterates are aligned —
  * the convergence property power iteration exists to deliver.
  */
class PcaPowerSpec extends SparkSpec {

  private def simulate(dir: String): Seq[(Long, Long, Long)] = {
    val vecs = spark.read.parquet(dir + "/embeddings.parquet")
      .selectExpr(
        "transform(embedding, x -> CAST(floor(x * 10000) AS LONG)) AS q")
      .collect().map(_.getSeq[Long](0).toArray)
    val d = 64
    val n = BigInt(vecs.length)
    val sx = Array.tabulate(d)(i => vecs.map(v => BigInt(v(i))).sum)
    val c = Array.tabulate(d, d) { (i, j) =>
      val sxy = vecs.map(v => BigInt(v(i)) * v(j)).sum
      n * sxy - sx(i) * sx(j)
    }
    val mc = c.flatten.map(_.abs).max
    val sh = math.max(0, mc.bitLength - 36)
    val cs = c.map(_.map { x =>
      BigInt(x.signum) * (x.abs >> sh)
    })
    var v = Array.fill(d)(BigInt(1048576))
    var prev = v
    for (_ <- 1 to 8) {
      val u = Array.tabulate(d)(i =>
        (0 until d).map(j => cs(i)(j) * v(j)).sum)
      val dv = u.map(_.abs).max / 1048576 + 1
      prev = v
      v = u.map(x => BigInt(x.signum) * (x.abs / dv))
    }
    (0 until d).map(i => (i.toLong, prev(i).toLong, v(i).toLong))
  }

  test("eigenvector iterates recount from a serial BigInt simulation") {
    val dir = sf("sf0.001")
    val want = simulate(dir)
    val got = Similarity.pcaPower(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == want)
  }

  test("the last two iterates are aligned (cos^2 >= 0.99)") {
    val got = Similarity.pcaPower(spark, sf("sf0.001")).collect()
    assert(got.length == 64)
    val a = got.map(r => BigInt(r.getLong(1)))
    val b = got.map(r => BigInt(r.getLong(2)))
    val ab = a.zip(b).map { case (x, y) => x * y }.sum
    val aa = a.map(x => x * x).sum
    val bb = b.map(x => x * x).sum
    assert(aa > 0 && bb > 0, "non-degenerate iterates")
    assert(ab.signum > 0, "no sign flip between converged iterates")
    assert(100 * ab * ab >= 99 * aa * bb, s"cos^2 >= 0.99")
  }
}
