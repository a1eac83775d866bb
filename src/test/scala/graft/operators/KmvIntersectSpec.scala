package graft.operators

import graft.SparkSpec

/** sketch_kmv_intersect: serial recount of the whole sketch pipeline
  * (distinct hashes -> per-side k-min -> merged theta -> retained
  * intersection), plus the accuracy contract: the union and intersection
  * estimates must land within the KMV error envelope of the EXACT
  * cardinalities over the same code domain (k = 256 -> RSE ~ 1/sqrt(255)
  * ~ 6.3%; the assert allows 4 sigma).
  */
class KmvIntersectSpec extends SparkSpec {

  test("estimates match a serial recount and the exact cardinalities") {
    val dir = sf("sf0.001")
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "text").as[(Long, String)].collect()
    def codeOf(w: String): Long = {
      def a(i: Int): Long = if (i < w.length) w.charAt(i).toLong else 0L
      ((a(0) * 65536L + a(1) * 256L + a(2) + w.length) * 256L
        + (if (w.isEmpty) 0L else w.charAt(w.length - 1).toLong))
    }
    val sides = docs.flatMap { case (d, t) =>
      t.split(" ", -1)
        .map(w => (d % 2 == 0, codeOf(w) * 48271L % 2147483647L))
    }.distinct
    val hA = sides.collect { case (true, h) => h }.toSet
    val hB = sides.collect { case (false, h) => h }.toSet

    val k = 256
    val skA = hA.toSeq.sorted.take(k)
    val skB = hB.toSeq.sorted.take(k)
    val uni = (skA ++ skB).distinct.sorted.take(k)
    val theta = uni.max
    val common = skA.toSet.intersect(skB.toSet).intersect(uni.toSet).size
    // unsaturated sketch (ku < k): the union sketch holds EVERY distinct
    // hash, so the exact counts are emitted instead of the (ku-1)·M/θ
    // extrapolation (r15 ADVICE — the DataSketches theta convention)
    val wantUnion =
      if (uni.size < k) uni.size.toLong
      else (uni.size - 1).toLong * 2147483647L / theta
    val wantInter =
      if (uni.size < k) common.toLong
      else common.toLong * 2147483647L / theta

    val row = Sketches.kmvIntersect(spark, dir).head()
    assert(row.getLong(0) == uni.size.toLong)
    assert(row.getLong(1) == theta)
    assert(row.getLong(2) == wantUnion)
    assert(row.getLong(3) == wantInter)
    assert(row.getLong(4) == common.toLong)

    // accuracy envelope vs the exact cardinalities (4 sigma at k = 256)
    val exactU = hA.union(hB).size.toDouble
    val exactI = hA.intersect(hB).size.toDouble
    val rse = 4.0 / math.sqrt(k - 1.0)
    assert(math.abs(wantUnion - exactU) <= rse * exactU,
      s"union est $wantUnion vs exact $exactU")
    assert(math.abs(wantInter - exactI) <= rse * exactU,
      s"inter est $wantInter vs exact $exactI (envelope on union scale)")
  }
}
