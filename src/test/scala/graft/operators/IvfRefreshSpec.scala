package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.VersionedTable

/** Laws for the IVF mini-batch refresh (the index-maintenance op between
  * full refits): mass conservation, untouched-cell bit-stability, the
  * fold-in moving centroids TOWARD the full refit, and the persisted
  * lifecycle (save on base → refresh with appends → next version).
  */
class IvfRefreshSpec extends SparkSpec {
  import spark.implicits._

  private val dir = sf("sf0.001")

  private def split() = {
    val all = Similarity.qEmb(spark, dir)
    (all.filter($"vec_id" % 4 =!= 3), all.filter($"vec_id" % 4 === 3))
  }

  test("refresh conserves mass: per-cell m_old + n_new covers base + appends") {
    val (base, appends) = split()
    val report = graft.SparkEntry.queries("sim_ivf_refresh")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val totalMass = report.map(r => r._2 + r._3).sum
    assert(totalMass === base.count() + appends.count())
    assert(report.exists(_._3 > 0), "no cell received any appends")
  }

  test("cells the batch misses keep their centroid bit-for-bit") {
    val (base, appends) = split()
    val cents = Similarity.ivfCentroids(spark, base)
    val mOld = Similarity.ivfAssignOf(base, cents)
      .groupBy($"centroid".as("cid")).agg(count(lit(1)).as("m_old"))
    val cells = Similarity.ivfRefreshCells(cents, mOld, appends)
    val untouchedMoved = cells
      .groupBy($"cid")
      .agg(max($"n_new").as("n_new"),
        sum(when($"c_new" =!= $"c_old", 1L).otherwise(0L)).as("moved"))
      .filter($"n_new" === 0 && $"moved" > 0)
    assert(untouchedMoved.count() === 0L)
  }

  test("the fold-in moves centroids toward the full refit (measured, deterministic)") {
    val (base, appends) = split()
    val all = Similarity.qEmb(spark, dir)
    val stale = Similarity.ivfCentroids(spark, base)
    val mOld = Similarity.ivfAssignOf(base, stale)
      .groupBy($"centroid".as("cid")).agg(count(lit(1)).as("m_old"))
    val refreshed = Similarity.ivfRefreshCells(stale, mOld, appends)
    val refit = Similarity.ivfCentroids(spark, all)
      .select($"cid", posexplode($"cq").as(Seq("pos", "c_refit")))
    // squared L2 to the refit centroids over the cells both fits share
    def dist(df: org.apache.spark.sql.DataFrame, c: String): Long =
      df.join(refit, Seq("cid", "pos"))
        .agg(sum((col(c) - $"c_refit") * (col(c) - $"c_refit")))
        .head().getLong(0)
    val dStale = dist(refreshed, "c_old")
    val dRefreshed = dist(refreshed, "c_new")
    assert(dRefreshed < dStale,
      s"refresh did not approach the refit: $dRefreshed >= $dStale")
  }

  test("forget conserves mass and touches only cells with deletions") {
    val all = Similarity.qEmb(spark, dir)
    val nAll = all.count()
    val nDel = all.filter($"vec_id" % 10 === 7).count()
    val report = graft.SparkEntry.queries("sim_ivf_forget")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(report.map(_._2).sum === nAll)
    assert(report.map(_._3).sum === nDel)
    assert(report.exists(_._3 > 0), "no cell had any deletions")
    // cells without deletions must not move
    report.filter(_._3 == 0).foreach { case (cid, _, _, l2) =>
      assert(l2 === 0L, s"untouched cell $cid moved")
    }
  }

  test("forgetting the empty set is the identity on every centroid") {
    import org.apache.spark.sql.functions.{coalesce => _, _}
    val all = Similarity.qEmb(spark, dir)
    val cents = Similarity.ivfCentroids(spark, all)
    val mOld = Similarity.ivfAssignOf(all, cents)
      .groupBy($"centroid".as("cid")).agg(count(lit(1)).as("m_old"))
    val emptySums = cents.sparkSession.emptyDataFrame
      .withColumn("cid", lit(0L)).withColumn("pos", lit(0))
      .withColumn("sd", lit(0L)).withColumn("nd", lit(0L))
      .limit(0)
    val cells = Similarity.ivfForgetCells(cents, mOld, emptySums)
    assert(cells.filter($"c_new" =!= $"c_old").count() === 0L)
    assert(cells.filter($"n_del" =!= 0L).count() === 0L)
  }

  test("persisted lifecycle: save on base, refresh folds appends as the next version") {
    val (base, appends) = split()
    val path = java.nio.file.Files.createTempDirectory("graft-ivf-refresh")
      .toFile.getAbsolutePath + "/idx"
    Similarity.saveIvfIndexOf(spark, base, path)
    Similarity.refreshIvfIndex(spark, path, appends)
    assert(VersionedTable.versions(spark, s"$path/centroids") === Seq(0, 1))
    assert(VersionedTable.versions(spark, s"$path/assign") === Seq(0, 1))
    // the widened assignment covers every vector exactly once...
    val assign1 = VersionedTable.read(spark, s"$path/assign")
    assert(assign1.count() === base.count() + appends.count())
    assert(assign1.select($"vec_id").distinct().count() === assign1.count())
    // ...while the pinned version still serves the pre-refresh index
    assert(VersionedTable.read(spark, s"$path/assign", version = 0)
      .count() === base.count())
    // refreshed centroid table: same cells, and it matches ivfRefreshCells
    val cents0 = VersionedTable.read(spark, s"$path/centroids", version = 0)
    val cents1 = VersionedTable.read(spark, s"$path/centroids")
    assert(cents1.count() === cents0.count())
    val mOld = VersionedTable.read(spark, s"$path/assign", version = 0)
      .groupBy($"centroid".as("cid")).agg(count(lit(1)).as("m_old"))
    val expect = Similarity.ivfRefreshCells(cents0, mOld, appends)
      .groupBy($"cid")
      .agg(transform(array_sort(collect_list(struct($"pos", $"c_new"))),
        x => x.getField("c_new")).as("cq"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    val got = cents1.collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    assert(got === expect)
  }
}
