package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants of the round-4 analytics queries (the exact-value
  * gate is the DuckDB oracle; these pin the properties a value diff can't
  * explain, plus the plan shapes that matter at scale).
  */
class AnalyticsSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("q34 priority counts equal a distinct-count recomputation of EXISTS") {
    import spark.implicits._
    val got = Relational.q34OrderPriority(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val o = graft.sources.Tables.orders(spark, dir)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1996-07-01").cast("timestamp"))
    val want = o.join(graft.sources.Tables.lineitem(spark, dir),
        $"o_orderkey" === $"l_orderkey" && $"l_shipdate" > $"o_orderdate")
      .select($"o_orderpriority", $"o_orderkey").distinct()
      .groupBy($"o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
    assert(got.values.sum > 0)
  }

  test("q34 plan is a hash/merge semi-join, not a nested loop") {
    val plan = Relational.q34OrderPriority(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }

  test("q35 high + low line counts cover exactly the late lines") {
    import spark.implicits._
    val rows = Relational.q35LateLines(spark, dir).collect()
    val total = rows.map(r => r.getLong(1) + r.getLong(2)).sum
    val late = graft.sources.Tables.lineitem(spark, dir)
      .join(graft.sources.Tables.orders(spark, dir),
        $"l_orderkey" === $"o_orderkey")
      .filter($"l_shipdate" > $"o_orderdate").count()
    assert(total == late)
    assert(rows.nonEmpty)
  }

  test("funnel stages are non-increasing and stage 1 counts view users") {
    import spark.implicits._
    val stages = Events.funnel(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viewUsers = graft.sources.Tables.events(spark, dir)
      .filter($"event_type" === "view").select($"user_id").distinct().count()
    assert(stages("1_view") == viewUsers)
    assert(stages("1_view") >= stages("2_click"))
    assert(stages("2_click") >= stages("3_purchase"))
  }

  test("funnel stage ordering is strict: advancing events are after the prior stage") {
    import spark.implicits._
    // A user whose ONLY click precedes their first view must not advance.
    val ev = graft.sources.Tables.events(spark, dir)
      .select($"user_id", $"event_type", $"ts")
    val firstView = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("tv"))
    val lateClickUsers = ev.filter($"event_type" === "click")
      .join(firstView, "user_id").filter($"ts" > $"tv")
      .select($"user_id").distinct().count()
    val stages = Events.funnel(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stages("2_click") == lateClickUsers)
  }

  test("ngram top-k emits at most 5 rows per lang, counts non-increasing, via GroupedTopKExec") {
    import spark.implicits._
    val df = TextOps.ngramTopK(spark, dir)
    assert(df.queryExecution.executedPlan.toString.contains("GroupedTopK"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      assert(rs.length <= 5, s"$lang has ${rs.length} rows")
      val cnts = rs.map(_._3).toSeq
      assert(cnts == cnts.sorted.reverse, s"$lang counts not sorted: $cnts")
    }
    assert(rows.nonEmpty)
  }

  test("q33 resolves and quartiles span 1..4 (round-3 regression: window col renamed away)") {
    import spark.implicits._
    val q = Relational.q33RankBattery(spark, dir)
    val quartiles = q.select($"quartile").distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(quartiles == Seq(1L, 2L, 3L, 4L))
  }

  test("IVF probes from a saved index match the inline-fit ivf_topk exactly") {
    val path = java.nio.file.Files.createTempDirectory("graft-ivf")
      .toFile.getAbsolutePath + "/idx"
    val dir = sf("sf0.001")
    Similarity.saveIvfIndex(spark, dir, path)
    val fromIndex = Similarity.ivfTopKFromIndex(spark, dir, path)
      .collect().map(_.toSeq).toSeq
    val inline = Similarity.ivfTopK(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(fromIndex.nonEmpty && fromIndex == inline)
    // the assignment snapshot carries centroid zone maps: a one-cell probe
    // must not open every file
    val (kept, total) = graft.sources.VersionedTable
      .prunedFiles(spark, s"$path/assign", "centroid", 0L, 0L)
    assert(total > 1 && kept < total, s"no skipping: $kept/$total")
    // a re-fit commits as a new version; the old one stays probeable
    Similarity.saveIvfIndex(spark, dir, path)
    assert(graft.sources.VersionedTable
      .versions(spark, s"$path/assign") == Seq(0, 1))
    assert(Similarity.ivfTopKFromIndex(spark, dir, path, version = 0)
      .collect().map(_.toSeq).toSeq == inline)
    // ...and the re-fit version keeps its zone-map selectivity: the commit
    // is a REPLACE, so the range clustering (and with it file skipping)
    // must survive — an upsert-style rewrite would hash it away
    val (kept1, total1) = graft.sources.VersionedTable
      .prunedFiles(spark, s"$path/assign", "centroid", 0L, 0L, version = 1)
    assert(total1 > 1 && kept1 < total1, s"v1 lost skipping: $kept1/$total1")
  }

  test("IVF fit is parameterizable: a 16-cell, 3-iter index fills the wider cell space") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-ivf16")
      .toFile.getAbsolutePath + "/idx"
    val dir = sf("sf0.001")
    Similarity.saveIvfIndex(spark, dir, path, nCells = 16, iters = 3)
    val cents = graft.sources.VersionedTable.read(spark, s"$path/centroids")
    assert(cents.count() == 16L)
    val assign = graft.sources.VersionedTable.read(spark, s"$path/assign")
    // every vector assigned exactly once, into the widened cell space
    val nVec = graft.sources.Tables.embeddings(spark, dir).count()
    assert(assign.count() == nVec)
    val cells = assign.select($"centroid").distinct()
      .collect().map(_.getLong(0)).toSeq
    assert(cells.forall(c => c >= 0L && c < 16L), s"cell ids out of range: $cells")
    // the extra cells are actually used — the fit did not collapse back
    // into the default-8 space (deterministic: seeded corpus, seeded init)
    assert(cells.exists(_ >= 8L), "no cell beyond the default-8 space was used")
  }

  test("IVF recall is monotone in nprobe and nprobe=1 matches ivf_topk's hits") {
    import spark.implicits._
    val rec = Similarity.ivfRecall(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    val qids = rec.keys.map(_._2).toSeq.distinct
    assert(qids.size == 10, s"expected 10 query vectors, got ${qids.size}")
    qids.foreach { q =>
      val (nExact1, hit1) = rec((1, q))
      val (nExact2, hit2) = rec((2, q))
      assert(nExact1 == 3 && nExact2 == 3)
      // widening the probe set can only add candidates, never drop one
      assert(hit2 >= hit1, s"qid $q: recall fell $hit1 -> $hit2 at nprobe=2")
    }
    // the nprobe=1 branch IS ivf_topk's probe: hits must agree with a
    // direct intersection of ivf_topk and the exact top-3
    val exact = Similarity.cosineTopK(spark, dir)
      .filter($"rn" <= 3).select($"qid", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(spark, dir).select($"qid", $"vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    qids.foreach { q =>
      val direct = (exact & ivf).count(_._1 == q).toLong
      assert(rec((1, q))._2 == direct,
        s"qid $q: recall query says ${rec((1, q))._2} hits, direct check $direct")
    }
  }
}
