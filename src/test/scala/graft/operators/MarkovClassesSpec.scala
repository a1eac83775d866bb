package graft.operators

import graft.SparkSpec

/** ev_markov_classes: the squared-reachability SCC decomposition equals a
  * serial Floyd–Warshall-style closure over the collected skeleton, and
  * the class laws hold — classes partition the states, class ids are
  * member minima, recurrent ⟺ closed under the skeleton.
  */
class MarkovClassesSpec extends SparkSpec {

  private def truth(dir: String): Seq[(String, String, Long)] = {
    import spark.implicits._
    val ev = spark.read.parquet(dir + "/events.parquet")
      .selectExpr("user_id", "cast(ts AS STRING)", "event_id", "event_type")
      .as[(Long, String, Long, String)].collect()
    val trans = ev.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      g.sortBy(r => (r._2, r._3)).map(_._4).sliding(2)
        .filter(_.length == 2).map(s => (s(0), s(1))).toSeq
    }
    val counts = trans.groupBy(identity).map { case (k, g) => k -> g.size }
    val outMass = trans.groupBy(_._1).map { case (f, g) => f -> g.size }
    val skel = counts.keys.filter { case (f, t) =>
      counts((f, t)) * 1000L >= outMass(f) * 200L
    }.toSet
    val nodes = ev.map(_._4).distinct.sorted
    // serial transitive closure
    var reach = nodes.map(v => (v, v)).toSet ++ skel
    var grew = true
    while (grew) {
      val next = reach ++ (for ((a, b) <- reach; (c, d) <- reach
        if b == c) yield (a, d))
      grew = next.size > reach.size
      reach = next
    }
    val cls = nodes.map { v =>
      v -> nodes.filter(w => reach((v, w)) && reach((w, v))).min
    }.toMap
    val leaky = skel.filter { case (f, t) => cls(f) != cls(t) }
      .map { case (f, _) => cls(f) }
    nodes.map(v => (v, cls(v), if (leaky(cls(v))) 0L else 1L))
  }

  test("classes equal the serial closure") {
    val dir = sf("sf0.001")
    val want = truth(dir)
    val got = Events.markovClasses(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == want)
  }

  test("class laws: partition, min labeling, closure <=> recurrence") {
    val got = Events.markovClasses(spark, sf("sf0.001")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val byClass = got.groupBy(_._2)
    byClass.foreach { case (cid, members) =>
      assert(members.map(_._1).min == cid, s"class $cid not min-labeled")
      assert(members.map(_._3).distinct.length == 1,
        "recurrence is a CLASS property")
    }
    assert(got.map(_._1).distinct.length == got.length,
      "every state in exactly one class")
    assert(got.exists(_._3 == 1L), "a finite chain has a recurrent class")
  }
}
