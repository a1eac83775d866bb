package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.VersionedTable

/** Laws for the IVF cell split/retire lifecycle event (the index-world
  * analogue of the reference store's load-triggered resize): mass
  * conservation through the split, bit-stability of untouched cells
  * across the commit, retirement of all-deleted cells, and determinism.
  */
class IvfSplitSpec extends SparkSpec {
  import spark.implicits._

  private val dir = sf("sf0.001")

  private def report() =
    graft.SparkEntry.queries("sim_ivf_split")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))

  test("split conserves mass: children partition the parent exactly") {
    val rows = report()
    assert(rows.nonEmpty, "no hot cell at gate scale — the gate is vacuous")
    rows.foreach { case (cid, mBefore, mA, mB, _, _, _) =>
      assert(mA + mB === mBefore, s"cell $cid: $mA + $mB != $mBefore")
    }
    assert(rows.exists { case (_, _, mA, mB, _, _, _) => mA > 0 && mB > 0 },
      "no split produced two populated children")
  }

  test("children separate farther than either moved from the parent") {
    // farthest-pair seeding: the two children must end up apart (a split
    // that leaves both children on the parent centroid relieved nothing)
    report().filter { case (_, _, mA, mB, _, _, _) => mA > 0 && mB > 0 }
      .foreach { case (cid, _, _, _, mvA, mvB, sep) =>
        assert(sep > 0L, s"cell $cid: children coincide")
        assert(sep >= mvA.max(mvB),
          s"cell $cid: sep $sep < move ($mvA, $mvB)")
      }
  }

  test("the gate query is deterministic") {
    assert(report().toSeq === report().toSeq)
  }

  test("persisted lifecycle: split commits the next version; untouched cells bit-identical; members re-pointed") {
    val all = Similarity.qEmb(spark, dir).localCheckpoint(true)
    val path = java.nio.file.Files.createTempDirectory("graft-ivf-split")
      .toFile.getAbsolutePath + "/idx"
    Similarity.saveIvfIndexOf(spark, all, path)
    Similarity.splitIvfIndex(spark, path, all)
    assert(VersionedTable.versions(spark, s"$path/centroids") === Seq(0, 1))
    assert(VersionedTable.versions(spark, s"$path/assign") === Seq(0, 1))
    val cents0 = VersionedTable.read(spark, s"$path/centroids", version = 0)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    val cents1 = VersionedTable.read(spark, s"$path/centroids")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    val assign0 = VersionedTable.read(spark, s"$path/assign", version = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val assign1 = VersionedTable.read(spark, s"$path/assign")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val masses0 = assign0.values.groupBy(identity).map { case (c, v) =>
      (c, v.size.toLong) }
    val n = assign0.size.toLong
    val hot = masses0.filter { case (_, m) =>
      m * cents0.size > n }.keySet
    // untouched (non-hot) cells keep their centroid row bit-for-bit
    (cents0.keySet -- hot).foreach { cid =>
      assert(cents1(cid) === cents0(cid), s"untouched cell $cid moved")
    }
    // every hot cell gained exactly one fresh sibling above max(cid)
    val maxCid0 = cents0.keys.max
    val fresh = cents1.keySet.filter(_ > maxCid0)
    assert(fresh.size === hot.size)
    assert(cents1.size === cents0.size + hot.size)
    // membership: same vectors, split members point to parent or sibling,
    // non-split members unchanged
    assert(assign1.keySet === assign0.keySet)
    assign0.foreach { case (vid, c0) =>
      if (hot(c0)) assert(assign1(vid) === c0 || fresh(assign1(vid)))
      else assert(assign1(vid) === c0, s"non-split member $vid moved")
    }
    // splits shed mass, never gain it, and the total is conserved
    val masses1 = assign1.values.groupBy(identity).map { case (c, v) =>
      (c, v.size.toLong) }
    hot.foreach { cid =>
      assert(masses1.getOrElse(cid, 0L) <= masses0(cid))
    }
    assert(masses1.values.sum === masses0.values.sum)
  }

  test("a cell with zero members retires at the split commit") {
    val all = Similarity.qEmb(spark, dir).localCheckpoint(true)
    val path = java.nio.file.Files.createTempDirectory("graft-ivf-retire")
      .toFile.getAbsolutePath + "/idx"
    val cents = Similarity.ivfCentroids(spark, all)
    // a ghost cell whose members have all been forgotten: present in the
    // centroid table, absent from the assignment
    val ghost = Seq((99L, Seq.fill(64)(0L))).toDF("cid", "cq")
    VersionedTable.init(cents.unionByName(ghost), s"$path/centroids")
    VersionedTable.init(
      Similarity.ivfAssignOf(all, cents)
        .repartitionByRange(4, $"centroid"),
      s"$path/assign", statsCols = Seq("centroid"))
    Similarity.splitIvfIndex(spark, path, all)
    val cids1 = VersionedTable.read(spark, s"$path/centroids")
      .select($"cid").collect().map(_.getLong(0)).toSet
    assert(!cids1.contains(99L), "empty cell survived the split commit")
    val cents0Cids = cents.select($"cid").collect().map(_.getLong(0)).toSet
    assert((cents0Cids -- cids1).isEmpty,
      "a populated cell was dropped with the empty one")
  }
}
