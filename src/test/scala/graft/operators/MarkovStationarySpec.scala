package graft.operators

import graft.SparkSpec

/** ev_markov_stationary: the distributed fixed-point chain iteration
  * recounts from a serial simulation over serially-rebuilt transition
  * counts, and the fixed-point conservation laws hold — total mass is
  * non-increasing round over round (floors only lose), and the permille
  * shares sum to 1000 minus at most one floor unit per state.
  */
class MarkovStationarySpec extends SparkSpec {

  private def chain(dir: String) = {
    val ev = spark.read.parquet(dir + "/events.parquet")
      .selectExpr("user_id",
        // fixed-width render: lexicographic order = chronological
        "date_format(ts, 'yyyy-MM-dd HH:mm:ss.SSSSSS') AS ts",
        "event_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3)))
    val trans = ev.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      val s = g.sortBy(t => (t._2, t._3)).map(_._4)
      s.zip(s.tail)
    }
    val counts = trans.groupBy(identity)
      .map { case (k, g) => k -> g.length.toLong }
    val states = ev.map(_._4).distinct.sorted
    (counts, states)
  }

  test("stationary iterates recount from a serial chain simulation") {
    val dir = sf("sf0.001")
    val (counts, states) = chain(dir)
    val rowN = counts.groupBy(_._1._1)
      .map { case (f, g) => f -> g.values.sum }
    var pi = states.map(s => s -> 1000000L).toMap
    var prev = pi
    for (_ <- 1 to 8) {
      prev = pi
      pi = states.map { to =>
        to -> states.map { from =>
          counts.get((from, to))
            .map(n => pi(from) * n / rowN(from)).getOrElse(0L)
        }.sum
      }.toMap
    }
    val tot = pi.values.sum
    val want = states.map(s =>
      (s, prev(s), pi(s), 1000L * pi(s) / tot))
    val got = Events.markovStationary(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("mass is floor-non-increasing and shares fill the permille") {
    val got = Events.markovStationary(spark, sf("sf0.001")).collect()
    assert(got.nonEmpty)
    val prevMass = got.map(_.getLong(1)).sum
    val mass = got.map(_.getLong(2)).sum
    assert(mass <= prevMass, "floors only lose mass")
    val shares = got.map(_.getLong(3)).sum
    assert(shares <= 1000L && shares >= 1000L - got.length,
      s"share sum $shares within one floor unit per state")
  }
}
