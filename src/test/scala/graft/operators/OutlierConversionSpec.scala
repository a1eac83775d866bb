package graft.operators

import graft.SparkSpec
import graft.sources.Tables

/** labelOutliers / conversionLag / q45: in-memory recounts over sf0.001
  * plus each contract's structural laws.
  */
class OutlierConversionSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("labelOutliers ranks by exact own-centroid distance") {
    import spark.implicits._
    val q = Tables.embeddings(spark, dir)
      .select($"vec_id", $"label".cast("long"),
        $"embedding".cast("array<double>"))
      .as[(Long, Long, Seq[Double])].collect()
      .map { case (id, lab, v) =>
        (id, lab, v.map(x => math.floor(x * 10000d).toLong).toArray)
      }
    val dims = q.head._3.length
    val cent = q.groupBy(_._2).map { case (lab, vs) =>
      lab -> Array.tabulate(dims) { d =>
        val col = vs.map(_._3(d))
        math.floor(col.sum.toDouble / col.length).toLong
      }
    }
    val expect = q.map { case (id, lab, v) =>
      val m = cent(lab)
      val dist = v.indices.map { d =>
        val df = v(d) - m(d); df * df
      }.sum
      (id, lab, dist)
    }.sortBy { case (id, _, dist) => (-dist, id) }.take(20)
      .zipWithIndex
      .map { case ((id, lab, dist), i) => (i + 1L, id, lab, dist) }
    val got = Similarity.labelOutliers(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expect.toSeq)
  }

  test("conversionLag matches an exact recount and conserves viewers") {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"user_id", $"event_type",
        org.apache.spark.sql.functions.unix_micros($"ts"))
      .as[(Long, String, Long)].collect()
    val firstView = ev.filter(_._2 == "view").groupBy(_._1)
      .map { case (u, rows) => u -> rows.map(_._3).min }
    val lags = firstView.map { case (u, vus) =>
      val buys = ev.filter(e => e._1 == u && e._2 == "purchase" &&
        e._3 >= vus).map(_._3)
      u -> (if (buys.isEmpty) None
            else Some(Math.floorDiv(buys.min - vus, 60000000L)))
    }
    val expect = lags.values.groupBy {
      case None => -1L
      case Some(m) => java.lang.Long.toBinaryString(m + 1).length.toLong
    }.map { case (b, ls) =>
      val ms = ls.flatten
      b -> ((ls.size.toLong,
        if (ms.isEmpty) None else Some(ms.min),
        if (ms.isEmpty) None else Some(ms.max)))
    }
    val got = Events.conversionLag(spark, dir).collect()
      .map { r =>
        r.getLong(0) -> ((r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))
      }.toMap
    assert(got == expect)
    // bucket histogram conserves the viewing population
    assert(got.values.map(_._1).sum == firstView.size)
  }

  test("q45 small-quantity filter matches a naive recount") {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .select($"l_partkey", $"l_quantity", $"l_extendedprice")
      .as[(Long, Double, Double)].collect()
      .map { case (p, q, e) =>
        (p, math.round(q * 100), math.round(e * 100))
      }
    val per = li.groupBy(_._1).map { case (p, rows) =>
      p -> ((rows.map(_._2).sum, rows.length.toLong))
    }
    val kept = li.filter { case (p, qc, _) =>
      val (sumQc, n) = per(p); qc * n * 2 < sumQc
    }
    val r = Relational.q45AvgQtyFilter(spark, dir).collect().head
    assert(r.getLong(0) == kept.length.toLong)
    assert(r.getLong(1) == kept.map(_._3).sum)
  }
}
