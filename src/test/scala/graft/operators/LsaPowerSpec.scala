package graft.operators

import graft.SparkSpec

/** text_lsa_power: the Gram-free sparse power iteration recounts from a
  * serial ping-pong (u ← A·v, v ← Aᵀ·u with the same integer rescales);
  * nonnegativity law (A ≥ 0 and a positive start keep every iterate
  * nonnegative — no sign indeterminacy).
  */
class LsaPowerSpec extends SparkSpec {

  test("top-10 loadings recount from a serial sparse power iteration") {
    val dir = sf("sf0.001")
    val docs = spark.read.parquet(dir + "/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq)
    val tf = docs.flatMap { case (id, ws) =>
      ws.groupBy(identity).map { case (w, g) => (w, id, g.length.toLong) }
    }
    val dfm = tf.groupBy(_._1).map { case (w, g) => w -> g.length.toLong }
    val n = docs.length.toLong
    def bitlen(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    val triples = tf.map { case (w, id, t) => (w, id, t * bitlen(n / dfm(w))) }
    var v = docs.map(_._1 -> 1048576L).toMap
    var u = Map.empty[String, Long]
    for (_ <- 1 to 4) {
      val u0 = scala.collection.mutable.Map.empty[String, Long]
      triples.foreach { case (w, id, wt) =>
        u0(w) = u0.getOrElse(w, 0L) + wt * v(id)
      }
      val du = u0.values.map(math.abs).max / 1048576L + 1L
      u = u0.map { case (w, x) => w -> x / du }.toMap
      val v0 = scala.collection.mutable.Map.empty[Long, Long]
      triples.foreach { case (w, id, wt) =>
        v0(id) = v0.getOrElse(id, 0L) + wt * u(w)
      }
      val dv = v0.values.map(math.abs).max / 1048576L + 1L
      v = docs.map { case (id, _) => id -> v0.getOrElse(id, 0L) / dv }.toMap
    }
    val want = u.toSeq.sortBy { case (w, x) => (-x, w) }.take(10)
    val got = TextOps.lsaPower(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want)
    assert(got.forall(_._2 >= 0L), "nonnegativity of the top iterate")
    assert(got.head._2 > 0L)
  }
}
