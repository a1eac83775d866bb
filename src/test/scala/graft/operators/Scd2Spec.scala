package graft.operators

import java.time.LocalDateTime

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Laws of the SCD Type-2 build (Events.scd2Build) at sf0.001: per-user
  * version numbering is dense from 1, exactly one current row per user,
  * validity intervals chain exactly (valid_to(v) = valid_from(v+1)),
  * adjacent versions always change state (run compression is maximal),
  * and a point-in-time lookup through the dimension reproduces the raw
  * event stream's state at every event timestamp.
  */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private lazy val dir = sf("sf0.001")
  private lazy val dim = Events.scd2Build(spark, dir)
    .as[(Long, Long, String, LocalDateTime, Option[LocalDateTime], Boolean)]
    .collect()
    .groupBy(_._1).map { case (u, vs) => u -> vs.sortBy(_._2) }

  test("version numbers are dense from 1 and exactly one row is current") {
    dim.foreach { case (u, vs) =>
      assert(vs.map(_._2).toSeq === (1L to vs.length.toLong), s"user $u")
      assert(vs.count(_._6) === 1, s"user $u")
      assert(vs.last._6 && vs.last._5.isEmpty, s"user $u")
    }
  }

  test("validity intervals chain: valid_to(v) == valid_from(v+1)") {
    dim.foreach { case (u, vs) =>
      vs.sliding(2).filter(_.length == 2).foreach { case Array(a, b) =>
        assert(a._5.contains(b._4), s"user $u versions ${a._2}/${b._2}")
        assert(!a._4.isAfter(b._4), s"user $u ordering")
      }
    }
  }

  test("run compression is maximal: adjacent versions change state") {
    dim.foreach { case (u, vs) =>
      vs.sliding(2).filter(_.length == 2).foreach { case Array(a, b) =>
        assert(a._3 != b._3, s"user $u versions ${a._2}/${b._2}")
      }
    }
  }

  test("point-in-time lookup reproduces the raw stream's state") {
    val events = Tables.events(spark, dir)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .as[(Long, LocalDateTime, Long, String)].collect()
      .groupBy(_._1)
    events.foreach { case (u, evs) =>
      val vs = dim(u)
      val ordered = evs.sortBy(e => (e._2, e._3))
      // probe at every distinct event timestamp: the dimension's state
      // as-of ts (latest version with valid_from <= ts) must equal the
      // stream's state after the last event at-or-before ts
      ordered.map(_._2).distinct.foreach { ts =>
        val expected = ordered.takeWhile(e => !e._2.isAfter(ts)).last._4
        val got = vs.filter(v => !v._4.isAfter(ts)).maxBy(_._2)._3
        assert(got === expected, s"user $u at $ts")
      }
    }
  }

  test("PIT enrichment: conservation and an independent cell recount") {
    val got = Events.scd2Pit(spark, dir)
      .as[(String, String, Long, Long, Long)].collect().toSeq
    val events = Tables.events(spark, dir)
      .select($"user_id", $"ts", $"event_type",
        round($"value" * 100).cast("long"))
      .as[(Long, LocalDateTime, String, Long)].collect()
    // every event matches exactly one half-open version interval
    assert(got.map(_._3).sum === events.length.toLong)
    // cell recount: state at ts = the interval containing ts
    def stateAt(u: Long, ts: LocalDateTime): String =
      dim(u).filter(v => !v._4.isAfter(ts) &&
        v._5.forall(_.isAfter(ts))).head._3
    val expect = events.groupBy(e => (stateAt(e._1, e._2), e._3)).map {
      case (k, es) =>
        k -> ((es.length.toLong, es.map(_._1).distinct.length.toLong,
          es.map(_._4).sum))
    }
    assert(got.map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
      === expect)
    // with per-user-unique timestamps the incidence matrix is diagonal;
    // off-diagonal cells may exist ONLY at same-ts ties
    val tied = events.groupBy(e => (e._1, e._2))
      .exists(_._2.map(_._3).distinct.length > 1)
    if (!tied) assert(got.forall(r => r._1 == r._2))
  }

  test("version count equals an independent change-count recount") {
    val raw = Tables.events(spark, dir)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .as[(Long, LocalDateTime, Long, String)].collect()
      .groupBy(_._1)
    raw.foreach { case (u, evs) =>
      val ordered = evs.sortBy(e => (e._2, e._3)).map(_._4)
      val changes = 1 + ordered.sliding(2).count {
        case Array(a, b) => a != b
        case _           => false
      }
      assert(dim(u).length === changes, s"user $u")
    }
  }
}
