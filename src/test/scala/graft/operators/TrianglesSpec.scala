package graft.operators

import graft.SparkSpec

/** triangles: certified by a brute-force in-memory triangle enumeration
  * over the same candidate-pair edge set (adjacency sets, all a<b<c
  * combinations), plus the structural laws — counts positive, and every
  * counted doc really sits on at least one closed triple.
  */
class TrianglesSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("per-doc triangle counts match a brute-force enumeration") {
    val got = TextOps.triangles(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    val pairs = TextOps.minhashPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val nodes = adj.keys.toArray.sorted
    val cnt = scala.collection.mutable.Map.empty[Long, Long]
    for {
      a <- nodes
      b <- adj(a) if b > a
      c <- adj(a) if c > b && adj(b).contains(c)
    } Seq(a, b, c).foreach(v => cnt(v) = cnt.getOrElse(v, 0L) + 1)

    assert(got == cnt.toMap)
    assert(got.nonEmpty, "corpus produced no triangles — spec is vacuous")
    assert(got.values.forall(_ > 0))
  }
}
