package graft.operators

import graft.SparkSpec
import graft.sources.Tables

/** kmvSetOps: certified by a full in-memory recompute of the per-flag KMV
  * sketches and the pairwise union/intersection estimator algebra, plus
  * the containment laws the estimator implies.
  */
class KmvSetOpsSpec extends SparkSpec {

  private val dir = sf("sf0.001")
  private val M = 2147483647L

  test("pairwise union/intersection estimates match an in-memory " +
      "sketch recompute") {
    import spark.implicits._
    val got = Sketches.kmvSetOps(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7), r.getLong(8))))
      .toMap

    val rows = Tables.lineitem(spark, dir)
      .select($"l_returnflag", $"l_partkey").collect()
      .map(r => (r.getString(0), r.getLong(1))).distinct
    val flags = rows.map(_._1).distinct.sorted
    def sketch(g: String): Vector[Long] =
      rows.collect { case (f, pk) if f == g => (2654435761L * pk + 12007L) % M }
        .distinct.sorted.take(64).toVector
    def exact(g: String): Set[Long] =
      rows.collect { case (f, pk) if f == g => pk }.toSet

    val expect = (for {
      g1 <- flags; g2 <- flags if g1 < g2
    } yield {
      val (sa, sb) = (sketch(g1), sketch(g2))
      val union = (sa ++ sb).distinct.sorted.take(64)
      val (nKept, kth) = (union.length.toLong, union.last)
      val nBoth = union.count(h => sa.contains(h) && sb.contains(h)).toLong
      val estU = math.floor((nKept - 1).toDouble * M.toDouble / kth).toLong
      val estI = math.floor(nBoth.toDouble * estU.toDouble / nKept).toLong
      val (ea, eb) = (exact(g1), exact(g2))
      (g1, g2) -> ((nKept, kth, nBoth, estU, estI,
        (ea union eb).size.toLong, (ea intersect eb).size.toLong))
    }).toMap
    assert(got == expect)

    // containment laws of the algebra
    got.values.foreach { case (nKept, _, nBoth, estU, estI, exU, exI) =>
      assert(nBoth <= nKept)
      assert(estI <= estU)
      assert(exI <= exU)
    }
    // the estimator must be in the right ballpark for k = 64 (stderr
    // ~1/sqrt(64); 2x is far outside plausible noise and would indicate a
    // broken merge, not variance)
    got.values.foreach { case (_, _, _, estU, _, exU, _) =>
      assert(estU > exU / 2 && estU < exU * 2,
        s"union estimate $estU implausible vs exact $exU")
    }
  }
}
