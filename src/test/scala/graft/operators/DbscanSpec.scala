package graft.operators

import graft.SparkSpec

/** sim_dbscan: the distributed DBSCAN (grid-blocked ε-graph, degree-based
  * core test, star-contraction components, min-core-neighbor border
  * assignment) recounts from a serial union-find DBSCAN over collected
  * embeddings with the same quantization and rounding; plus the role laws
  * (noise has no core neighbor, border is non-core with one, clusters are
  * labeled by their minimum core member).
  */
class DbscanSpec extends SparkSpec {

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Serial DBSCAN: (vec_id -> (role, cluster)). */
  private def truth(dir: String): Map[Long, (Long, Long)] = {
    import spark.implicits._
    val emb = spark.read.parquet(dir + "/embeddings.parquet")
      .selectExpr("vec_id", "cast(embedding as array<double>) AS e")
      .as[(Long, Seq[Double])].collect()
      .map { case (id, v) =>
        (id, v.map(x => math.floor(x * 10000d).toLong).toArray)
      }.sortBy(_._1)
    val n2 = emb.map { case (id, q) => id -> q.map(x => x * x).sum }.toMap
    val eps = for {
      i <- emb.indices
      j <- (i + 1) until emb.length
      (a, qa) = emb(i)
      (b, qb) = emb(j)
      d = qa.zip(qb).map { case (x, y) => x * y }.sum
      if round4(d.toDouble / (math.sqrt(n2(a).toDouble) * math.sqrt(n2(b).toDouble))) >= 0.30
    } yield (a, b)
    val adj = (eps ++ eps.map(p => (p._2, p._1)))
      .groupBy(_._1).map { case (k, g) => k -> g.map(_._2).toSet }
    val core = adj.filter(_._2.size >= 3).keySet
    // union-find over core-core edges
    val parent = scala.collection.mutable.Map(core.toSeq.map(c => c -> c): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for ((a, b) <- eps if core(a) && core(b)) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val label = core.map(c => c -> core.filter(x => find(x) == find(c)).min).toMap
    emb.map { case (id, _) =>
      if (core(id)) id -> (2L, label(id))
      else {
        val coreNbrs = adj.getOrElse(id, Set.empty).filter(core)
        if (coreNbrs.nonEmpty) id -> (1L, coreNbrs.map(label).min)
        else id -> (0L, -1L)
      }
    }.toMap
  }

  test("distributed DBSCAN equals the serial union-find truth") {
    val dir = sf("sf0.001")
    val want = truth(dir)
    val got = Similarity.dbscanClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.size == want.size)
    assert(got == want)
    val roles = got.values.map(_._1).toSet
    assert(roles == Set(0L, 1L, 2L),
      s"calibration: all three roles should be populated, got $roles")
  }

  test("role laws: cluster labels are min members; noise clusters are -1") {
    val got = Similarity.dbscanClusters(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byCluster = got.filter(_._2 == 2L).groupBy(_._3)
    byCluster.foreach { case (cl, members) =>
      assert(members.map(_._1).min == cl,
        s"cluster $cl not labeled by its min core member")
    }
    got.filter(_._2 == 0L).foreach(r => assert(r._3 == -1L, s"noise: $r"))
    got.filter(_._2 == 1L).foreach(r =>
      assert(byCluster.contains(r._3), s"border points to a live cluster: $r"))
  }
}
