package graft.operators

import graft.SparkSpec

/** rec_item_cosine: per-item top-3 recommendations recount from a serial
  * basket fold under the same (cos², s_ab, rec) order, and cosine laws
  * hold — cos² ≤ 10⁶ (Cauchy–Schwarz on basket-membership vectors) and
  * every emitted edge exists symmetrically in the pair lattice.
  */
class ItemCosineSpec extends SparkSpec {

  test("per-item top-3 recounts from a serial basket fold") {
    val dir = sf("sf0.001")
    val items = spark.read.parquet(dir + "/lineitem.parquet")
      .selectExpr("l_orderkey AS o", "l_partkey AS p")
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val supp = items.groupBy(_._2).map { case (p, g) => p -> g.length.toLong }
    val pairs = items.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      val ps = g.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.groupBy(identity).map { case (k, c) => k -> c.length.toLong }
      .filter(_._2 >= 2L)
    val sym = pairs.toSeq.flatMap { case ((a, b), sab) =>
      Seq((a, b, sab), (b, a, sab))
    }
    val want = sym.groupBy(_._1).toSeq.flatMap { case (item, g) =>
      val scored = g.map { case (_, rec, sab) =>
        val c2 = (BigInt(1000000) * sab * sab /
          (BigInt(supp(item)) * supp(rec))).toLong
        (rec, sab, c2)
      }.sortBy(t => (-t._3, -t._2, t._1)).take(3)
      scored.zipWithIndex.map { case ((rec, sab, c2), i) =>
        (item, (i + 1).toLong, rec, sab, c2)
      }
    }.sortBy(t => (t._1, t._2))
    val got = Affinity.itemCosine(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == want)
  }

  test("cosine-squared stays in [0, 1e6] and rec lists are ranked") {
    val got = Affinity.itemCosine(spark, sf("sf0.001")).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(4) >= 0L && r.getLong(4) <= 1000000L,
        s"cos2 band: $r")
      assert(r.getInt(1) >= 1 && r.getInt(1) <= 3, s"rank band: $r")
    }
  }
}
