package graft.operators

import graft.SparkSpec

/** layout_zorder: the zone-map accounting recounts from a serial fold
  * (same binning, same bit interleave), and the design claims hold — the
  * z-order layout scans no more files than the single-column sort on the
  * 2-D box probe, and the matched-row counts are layout-invariant.
  */
class LayoutOpsSpec extends SparkSpec {

  private def interleave(bp: Long, bs: Long): Long =
    (0 until 6).map(j =>
      (((bp >> j) & 1L) << (2 * j)) | (((bs >> j) & 1L) << (2 * j + 1)))
      .reduce(_ | _)

  private case class Zone(minP: Long, maxP: Long, minS: Long, maxS: Long,
      n: Long)

  test("zone-map accounting equals the serial recount") {
    import spark.implicits._
    val dir = sf("sf0.001")
    val rows = spark.read.parquet(dir + "/lineitem.parquet")
      .selectExpr("l_partkey", "l_suppkey").as[(Long, Long)].collect()
    val mp = rows.map(_._1).max
    val ms = rows.map(_._2).max
    val binned = rows.map { case (p, sk) =>
      (p * 64L / (mp + 1L), sk * 64L / (ms + 1L))
    }
    def zones(fileOf: ((Long, Long)) => Long): Map[Long, Zone] =
      binned.groupBy(fileOf).map { case (f, g) =>
        f -> Zone(g.map(_._1).min, g.map(_._1).max,
          g.map(_._2).min, g.map(_._2).max, g.length.toLong)
      }
    val layouts = Map(
      "zorder" -> zones { case (bp, bs) => interleave(bp, bs) / 64L },
      "psort" -> zones(_._1))
    val probes = Seq(("box_2d", 16L, 23L, 16L, 23L),
      ("p_range", 16L, 23L, 0L, 63L))
    val want = (for {
      (layout, zs) <- layouts.toSeq
      (probe, plo, phi, slo, shi) <- probes
    } yield {
      val hit = zs.values.filter(z =>
        !(z.maxP < plo || z.minP > phi || z.maxS < slo || z.minS > shi))
      val matched = binned.count { case (bp, bs) =>
        bp >= plo && bp <= phi && bs >= slo && bs <= shi
      }.toLong
      (layout, probe, zs.size.toLong, hit.size.toLong,
        hit.map(_.n).sum, matched)
    }).sortBy(r => (r._1, r._2))

    val got = LayoutOps.zorderSkipping(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want)
  }

  test("z-order dominates the 2-D box probe; matched rows are layout-free") {
    val got = LayoutOps.zorderSkipping(spark, sf("sf0.001")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val (zBox, pBox) = (got(("zorder", "box_2d")), got(("psort", "box_2d")))
    assert(zBox._1 <= pBox._1,
      s"z-order should never scan MORE files on the 2-D box: $zBox vs $pBox")
    assert(zBox._3 == pBox._3, "matched rows must be layout-invariant")
    val (zR, pR) = (got(("zorder", "p_range")), got(("psort", "p_range")))
    assert(zR._3 == pR._3, "matched rows must be layout-invariant")
    got.values.foreach { case (fs, rs, m) =>
      assert(rs >= m, s"zone maps can only over-read: scanned $rs < matched $m")
      assert(fs >= 1L)
    }
  }
}
