package graft.operators

import graft.SparkSpec
import graft.sources.Tables

/** matryoshkaRecall + sceneCuts: both certified by full in-memory
  * recomputes (brute-force double ranking; byte-level frame sums).
  */
class TruncRecallSceneSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("matryoshka recall matches a brute-force double ranking") {
    import spark.implicits._
    val got = Similarity.matryoshkaRecall(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    val vecs = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 10000d).toLong))
      .toMap
    def top3(dims: Int): Map[Long, Set[Long]] =
      vecs.keys.filter(_ < 10).map { q =>
        val qq = vecs(q).take(dims)
        val qn = math.sqrt(qq.map(x => x * x).sum.toDouble)
        q -> vecs.toSeq.filter(_._1 != q).map { case (id, v0) =>
          val v = v0.take(dims)
          val cos = BigDecimal(
            v.zip(qq).map { case (a, b) => a * b }.sum.toDouble
              / (math.sqrt(v.map(x => x * x).sum.toDouble) * qn))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP)
          (id, cos)
        }.sortBy { case (id, cos) => (-cos, id) }.take(3).map(_._1).toSet
      }.toMap
    val (full, pref) = (top3(64), top3(16))
    val expect = full.map { case (q, f) =>
      val hits = (f intersect pref(q)).size.toLong
      q -> ((hits, hits * 1000 / 3))
    }
    assert(got == expect)
    // the prefix dims must carry SOME signal on this corpus
    assert(got.values.map(_._1).sum > 0)
  }

  test("scene cuts match a byte-level recompute and cover every frame") {
    import spark.implicits._
    val got = Multimodal.sceneCuts(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getLong(2), r.getInt(3))))
      .toMap
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1).getBytes("UTF-8")))
    val expect = docs.flatMap { case (id, bytes) =>
      val sums = (0 until bytes.length / 8).map(f =>
        (f * 8 until f * 8 + 8).map(i => (bytes(i) & 0xff).toLong).sum)
      sums.zipWithIndex.map { case (s, f) =>
        val cut = if (f > 0 && math.abs(s - sums(f - 1)) > 256) 1 else 0
        (id, f) -> ((s, cut))
      }
    }.toMap
    assert(got == expect)
    // every media item contributes exactly len/8 complete frames
    val byMedia = got.keys.groupBy(_._1).view.mapValues(_.size).toMap
    docs.foreach { case (id, bytes) =>
      assert(byMedia.getOrElse(id, 0) == bytes.length / 8)
    }
    assert(got.values.exists(_._2 == 1), "no cut detected anywhere")
  }
}
