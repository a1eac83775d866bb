package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Laws of reciprocal-rank fusion (sim_hybrid_rrf): a complete
  * independent in-memory re-derivation of both channels and the fuse
  * (exact integer RRF), plus the structural laws — 5 rows per probe,
  * score consistency with the reported per-channel ranks, and
  * channel-dominance (a doc leading BOTH channels must lead the fusion).
  */
class HybridRrfSpec extends SparkSpec {
  import spark.implicits._

  private val dir = sf("sf0.001")

  test("fusion matches an independent two-channel recount") {
    val got = Similarity.hybridRrf(spark, dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Long]),
        Option(r.get(5)).map(_.asInstanceOf[Long])))

    // ---- in-memory vector channel
    val vecs = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 10000d).toLong))
      .toMap
    def cos(a: Seq[Long], b: Seq[Long]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum.toDouble
      val r = d / (math.sqrt(a.map(x => x * x).sum.toDouble)
        * math.sqrt(b.map(x => x * x).sum.toDouble))
      BigDecimal(r).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val vrank = (0L until 10L).map { q =>
      q -> vecs.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, cos(v, vecs(q))) }
        .sortBy { case (id, c) => (-c, id) }.take(20).zipWithIndex
        .map { case ((id, _), i) => id -> (i + 1L) }.toMap
    }.toMap

    // ---- in-memory lexical channel (idf-weighted distinct overlap,
    // df-PRUNED at the r13 corpus-relative threshold max(16, N/10) —
    // the stop-listed Zipf head never reaches the score)
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (d, t) => d -> t.split(" ", -1).toSet }.toMap
    val dfThresh = math.max(16L, docs.size.toLong / 10L)
    val dfreq = docs.values.flatten.groupBy(identity)
      .map { case (w, xs) => w -> xs.size.toLong }
      .filter { case (_, df) => df <= dfThresh }
    val lrank = (0L until 10L).map { q =>
      q -> docs.toSeq.filter(_._1 != q)
        .map { case (id, ws) =>
          (id, (ws & docs(q)).toSeq.flatMap(dfreq.get)
            .map(df => 1000000L / df).sum) }
        .filter(_._2 > 0L)
        .sortBy { case (id, s) => (-s, id) }.take(20).zipWithIndex
        .map { case ((id, _), i) => id -> (i + 1L) }.toMap
    }.toMap

    // ---- in-memory fuse
    val expect = (0L until 10L).flatMap { q =>
      val cand = vrank(q).keySet ++ lrank(q).keySet
      cand.toSeq.map { d =>
        val rv = vrank(q).get(d)
        val rl = lrank(q).get(d)
        val score = rv.map(r => 1000000L / (60L + r)).getOrElse(0L) +
          rl.map(r => 1000000L / (60L + r)).getOrElse(0L)
        (d, score, rv, rl)
      }.sortBy { case (d, s, _, _) => (-s, d) }.take(5).zipWithIndex
        .map { case ((d, s, rv, rl), i) => (q, i + 1L, d, s, rv, rl) }
    }
    assert(got.toSeq === expect)
  }

  test("structural laws: 5 per probe, score ≡ rank arithmetic, dominance") {
    val got = Similarity.hybridRrf(spark, dir).collect()
    val byQ = got.groupBy(_.getLong(0))
    assert(byQ.keySet === (0L until 10L).toSet)
    byQ.values.foreach { rs =>
      assert(rs.map(_.getLong(1)).sorted.toSeq === (1L to 5L))
      rs.foreach { r =>
        val rv = Option(r.get(4)).map(_.asInstanceOf[Long])
        val rl = Option(r.get(5)).map(_.asInstanceOf[Long])
        assert(rv.nonEmpty || rl.nonEmpty) // fused docs exist in a channel
        val s = rv.map(x => 1000000L / (60L + x)).getOrElse(0L) +
          rl.map(x => 1000000L / (60L + x)).getOrElse(0L)
        assert(r.getLong(3) === s)
      }
      // dominance: a doc leading both channels must be fused rank 1
      rs.find(r => r.get(4) == 1L && r.get(5) == 1L)
        .foreach(r => assert(r.getLong(1) === 1L))
    }
  }
}
