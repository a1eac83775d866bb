package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Laws of the incremental view refreshers (Materialized.scala): the
  * maintenance algebra must equal from-scratch recompute on the
  * effective rows — INCLUDING group birth (key first seen in the insert
  * batch) and group death (a key's last base row deleted), which the
  * uniform gate corpus never produces. Crafted CDC day:
  *
  *   base:    k1:{r1:10, r2:20}   k2:{r3:5}    k3:{r4:7, r5:3}
  *   deletes: r2 (k1's max!)      r3 (kills k2)
  *   inserts: k1:{r6:1}           k4:{r7:99}   (k4 is born)
  *
  * Effective: k1:{10,1}  k3:{7,3}  k4:{99} — k2 dead, k4 born, and k1's
  * max must fall from 20 to 10 (the runner-up the view never stored:
  * the case that makes max non-delta-maintainable and forces the
  * dirty-group recompute path).
  */
class MaterializedSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base: DataFrame = Seq(
    (1L, 101L, 10L), (1L, 102L, 20L), (2L, 103L, 5L),
    (3L, 104L, 7L), (3L, 105L, 3L)).toDF("key", "rid", "x")
  private lazy val ins: DataFrame = Seq(
    (1L, 106L, 1L), (4L, 107L, 99L)).toDF("key", "rid", "x")
  private lazy val del: DataFrame = Seq(
    (1L, 102L, 20L), (2L, 103L, 5L)).toDF("key", "rid", "x")

  private lazy val effective: DataFrame =
    base.join(del.select($"rid"), Seq("rid"), "left_anti").unionByName(ins)

  test("counting rule == recompute, with group birth and death") {
    val view = base.groupBy($"key")
      .agg(count(lit(1)).as("n"), sum($"x").as("s"))
    val got = Materialized
      .refreshCountSum(view, ins.select($"key", $"x"),
        del.select($"key", $"x"), "key")
      .orderBy($"key").as[(Long, Long, Long)].collect().toSeq
    val want = effective.groupBy($"key")
      .agg(count(lit(1)).as("n"), sum($"x").as("s"))
      .orderBy($"key").as[(Long, Long, Long)].collect().toSeq
    assert(got === want)
    assert(!got.exists(_._1 == 2L), "k2 must die (count reached 0)")
    assert(got.exists(_._1 == 4L), "k4 must be born from the insert batch")
  }

  test("dirty-group max refresh == recompute, incl. deleted-max demotion") {
    val view = base.groupBy($"key").agg(max($"x").as("m"))
    val got = Materialized
      .refreshMax(view, base, ins, del.select($"rid"), "key")
      .orderBy($"key").as[(Long, Long)].collect().toSeq
    val want = effective.groupBy($"key").agg(max($"x").as("m"))
      .orderBy($"key").as[(Long, Long)].collect().toSeq
    assert(got === want)
    assert(got.find(_._1 == 1L).map(_._2) === Some(10L),
      "k1's max must demote to the runner-up after its max row is deleted")
    assert(!got.exists(_._1 == 2L), "k2 must die")
    assert(got.find(_._1 == 4L).map(_._2) === Some(99L), "k4 must be born")
  }

  test("auxiliary-state distinct refresh == recompute, with value birth/death") {
    // k1: a(r201), a(r202), b(r203); k2: c(r204)
    // deletes: r202 (a survives via r201 — a multiplicity drop is NOT a
    // death), r203 (b dies in k1), r204 (k2 dies entirely)
    // inserts: k1 gains d (value birth), k3 is born with e
    val baseV = Seq((1L, 201L, "a"), (1L, 202L, "a"), (1L, 203L, "b"),
      (2L, 204L, "c")).toDF("key", "rid", "v")
    val insV = Seq((1L, "d"), (3L, "e")).toDF("key", "v")
    val delRids = Seq(202L, 203L, 204L).toDF("rid")
    val delV = baseV.join(delRids, Seq("rid"), "left_semi")
      .select($"key", $"v")
    val aux = baseV.groupBy($"key", $"v").agg(count(lit(1)).as("n"))
    val view = aux.groupBy($"key").agg(count(lit(1)).as("c"))
    val got = Materialized
      .refreshDistinct(view, aux, insV, delV, "key")
      .orderBy($"key").as[(Long, Long)].collect().toSeq
    val want = baseV.join(delRids, Seq("rid"), "left_anti")
      .select($"key", $"v")
      .unionByName(insV)
      .groupBy($"key").agg(count_distinct($"v").as("c"))
      .orderBy($"key").as[(Long, Long)].collect().toSeq
    assert(got === want)
    // k1: a survives (multiplicity 2->1, NOT a death), b dies, d born -> 2
    assert(got.find(_._1 == 1L).map(_._2) === Some(2L))
    assert(!got.exists(_._1 == 2L), "k2 must die with its last value")
    assert(got.find(_._1 == 3L).map(_._2) === Some(1L), "k3 must be born")
  }

  test("empty delta is the identity refresh") {
    val view = base.groupBy($"key")
      .agg(count(lit(1)).as("n"), sum($"x").as("s"))
    val empty = Seq.empty[(Long, Long)].toDF("key", "x")
    val got = Materialized.refreshCountSum(view, empty, empty, "key")
      .orderBy($"key").as[(Long, Long, Long)].collect().toSeq
    val want = view.orderBy($"key").as[(Long, Long, Long)].collect().toSeq
    assert(got === want)
  }

  test("insert-only day never touches the base in the max path") {
    // no deletes -> dirty set empty -> the refreshed view must equal the
    // pure merge max(view, insert max); also the algebraic identity check
    val view = base.groupBy($"key").agg(max($"x").as("m"))
    val noDel = Seq.empty[Long].toDF("rid")
    val got = Materialized.refreshMax(view, base, ins, noDel, "key")
      .orderBy($"key").as[(Long, Long)].collect().toSeq
    val want = base.unionByName(ins).groupBy($"key").agg(max($"x").as("m"))
      .orderBy($"key").as[(Long, Long)].collect().toSeq
    assert(got === want)
  }
}
