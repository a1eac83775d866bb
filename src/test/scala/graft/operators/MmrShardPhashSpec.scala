package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** mmrRerank / shardAssign / phashClusters: independent in-memory
  * recounts of the greedy, the prefix-sum cut and the component labels.
  */
class MmrShardPhashSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("MMR rerank matches an in-memory greedy recount") {
    import spark.implicits._
    val got = Similarity.mmrRerank(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))

    // exact integer recount: quantize, pool = top-8 by dot, greedy 7/3
    val vecs = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 10000).toLong).toArray)
      .toMap
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val expect = (0L until 5L).flatMap { qid =>
      val dq = vecs.toSeq.filter(_._1 != qid)
        .map { case (id, v) => id -> dot(v, vecs(qid)) }
      val pool = dq.sortBy { case (id, d) => (-d, id) }.take(8).toMap
      var chosen = Vector.empty[(Long, Long)] // (cid, score)
      for (i <- 1 to 4) {
        val cand = pool.filter(c => !chosen.exists(_._1 == c._1))
        val scored = cand.map { case (cid, d) =>
          val pen = if (chosen.isEmpty) 0L
            else chosen.map(s => dot(vecs(cid), vecs(s._1))).max
          cid -> (if (i == 1) 7L * d else 7L * d - 3L * pen)
        }
        val (wc, ws) = scored.toSeq.sortBy { case (id, sc) => (-sc, id) }.head
        chosen :+= ((wc, ws))
      }
      chosen.zipWithIndex.map { case ((cid, sc), i) => (qid, i + 1, cid, sc) }
    }
    assert(got.sorted.sameElements(expect.sorted))
  }

  test("shard assignment conserves the corpus and bounds every shard's " +
      "token load") {
    import spark.implicits._
    val rows = Sketches.shardAssign(spark, dir).collect()
    val ids = rows.map(_.getLong(0))
    assert(ids.sameElements(0L until ids.length)) // contiguous from 0
    val docs = Tables.documents(spark, dir)
      .select(size(split($"text", " ")).cast("long")).collect()
      .map(_.getLong(0))
    assert(rows.map(_.getLong(1)).sum == docs.length)
    assert(rows.map(_.getLong(2)).sum == docs.sum)
    // a shard's tokens = gap between consecutive cut starts, so at most
    // target + maxdoc - 1 (the straddling doc) for every shard
    val maxDoc = docs.max
    assert(rows.forall(_.getLong(2) <= 2000L + maxDoc - 1))
    assert(ids.length >= 2) // target actually splits this corpus
  }

  test("phash clusters match an in-memory union-find over the exact " +
      "Hamming<=2 graph") {
    import spark.implicits._
    val got = Multimodal.phashClusters(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    val hashes = Tables.documents(spark, dir)
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) ->
        Multimodal.stubPHash16(r.getString(1).getBytes("UTF-8")))
    val dh = hashes.map(_._2).distinct
    val parent = scala.collection.mutable.Map(dh.map(h => h -> h): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (a <- dh; b <- dh if a < b
         if java.lang.Long.bitCount(a ^ b) <= 2) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expect = hashes.groupBy { case (_, h) => find(h) }.toSeq
      .map { case (root, members) =>
        // label = component minimum HASH (star contraction's fixpoint)
        val lbl = members.map(_._2).map(find).min
        (math.min(lbl, members.map(_._2).min), members.length.toLong,
          members.map(_._2).distinct.length.toLong, members.map(_._1).min)
      }.sortBy(_._1)
    assert(got.length == expect.length)
    assert(got.map(_._2).sum == hashes.length) // media conserved
    assert(got.sorted.sameElements(expect.sorted))
  }
}
