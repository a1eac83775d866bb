package graft.operators

import graft.SparkSpec

/** sim_dbscan_ivf: the IVF-bucketed DBSCAN. Three laws:
  *  - soundness: the IVF ε-graph is a SUBSET of the exact grid-join
  *    ε-graph (candidates are verified with the identical exact cosine,
  *    so bucketing can only drop pairs, never invent them);
  *  - measured recall: the nprobe=2 cell co-membership keeps a
  *    substantial majority of the true ε-pairs at gate scale (the number
  *    the scaladoc's approximation claim rests on);
  *  - end-to-end: roles/clusters recount from a serial union-find DBSCAN
  *    run over the IVF ε-graph itself — the tail is exact given the
  *    candidate graph, so the approximation lives ONLY in candidate
  *    generation.
  */
class DbscanIvfSpec extends SparkSpec {

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("IVF ε-graph is a subset of the exact ε-graph, with measured recall") {
    val dir = sf("sf0.001")
    val exact = pairsOf(
      Similarity.nearDupPairsOf(Similarity.qEmb(spark, dir), 0.30, 8))
    val ivf = pairsOf(Similarity.ivfEpsEdges(spark, dir))
    assert((ivf -- exact).isEmpty,
      s"IVF emitted non-ε pairs: ${(ivf -- exact).take(5)}")
    val recall = ivf.size.toDouble / exact.size
    info(f"IVF ε-pair recall at gate: ${ivf.size}/${exact.size} = $recall%.3f")
    assert(recall >= 0.60,
      f"nprobe=2 recall collapsed: $recall%.3f (${ivf.size}/${exact.size})")
  }

  test("roles/clusters recount from serial union-find over the IVF ε-graph") {
    val dir = sf("sf0.001")
    val eps = pairsOf(Similarity.ivfEpsEdges(spark, dir)).toSeq
    val ids = spark.read.parquet(dir + "/embeddings.parquet")
      .select("vec_id").collect().map(_.getLong(0))
    val adj = (eps ++ eps.map(p => (p._2, p._1)))
      .groupBy(_._1).map { case (k, g) => k -> g.map(_._2).toSet }
    val core = adj.filter(_._2.size >= 3).keySet
    val parent = scala.collection.mutable.Map(core.toSeq.map(c => c -> c): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for ((a, b) <- eps if core(a) && core(b)) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val label = core.map(c => c -> core.filter(x => find(x) == find(c)).min).toMap
    val want = ids.map { id =>
      if (core(id)) id -> (2L, label(id))
      else {
        val coreNbrs = adj.getOrElse(id, Set.empty[Long]).filter(core)
        if (coreNbrs.nonEmpty) id -> (1L, coreNbrs.map(label).min)
        else id -> (0L, -1L)
      }
    }.toMap
    val got = Similarity.dbscanIvfClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.size == want.size)
    assert(got == want)
  }
}
