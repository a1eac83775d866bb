package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.MisraGries.misraGries

/** Laws of the Misra–Gries summary (see MisraGries.scala scaladoc):
  *
  *  1. CANDIDATE GUARANTEE — every item with true frequency > N/(k+1) is
  *     in the summary's key set, under any partitioning (the mergeable-
  *     summaries bound must survive Spark's partial/final agg tree).
  *  2. ESTIMATE BOUND — f − N/(k+1) ≤ est ≤ f for every reported item.
  *  3. EXACTNESS BELOW CAPACITY — with k ≥ distinct(input) the summary
  *     IS the exact count map (no decrement ever fires).
  *  4. PIPELINE INVARIANCE — the heavy-hitters two-pass output (candidate
  *     set → exact recount → threshold) is identical across partition
  *     counts even though the sketch's internal estimates are not.
  *
  * The law data is a deterministic Zipf-ish stream (item i repeated
  * ⌈C/i⌉ times): a real head-heavy distribution where k ≪ vocabulary
  * forces constant evictions — the regime the gate corpus (31 uniform
  * tokens < k) cannot exercise.
  */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = 200
  private val C = 2000
  // item i (1-based) appears max(1, C/i) times: counts 2000, 1000, 666...
  private lazy val zipfRows: Seq[String] =
    (1 to vocab).flatMap(i => Seq.fill(math.max(1, C / i))(s"tok$i"))
  private lazy val trueCounts: Map[String, Long] =
    zipfRows.groupBy(identity).map { case (w, g) => (w, g.size.toLong) }
  private lazy val n: Long = zipfRows.size.toLong

  private def summary(parts: Int, k: Int): Map[String, Long] =
    zipfRows.toDF("w").repartition(parts)
      .agg(misraGries(col("w"), k).as("mg"))
      .head().getMap[String, Long](0).toMap

  test("candidate guarantee: f > N/(k+1) items always present (1 and 7 partitions)") {
    val k = 16
    for (parts <- Seq(1, 7)) {
      val keys = summary(parts, k).keySet
      val mustHave = trueCounts.filter { case (_, f) => f * (k + 1) > n }.keySet
      assert(mustHave.nonEmpty, "law data must contain true heavy hitters")
      assert(mustHave.subsetOf(keys),
        s"missing heavy hitters at parts=$parts: ${mustHave -- keys}")
      assert(keys.size <= k, s"summary exceeded capacity: ${keys.size} > $k")
    }
  }

  test("estimate bound: f - N/(k+1) <= est <= f under merges") {
    val k = 16
    for (parts <- Seq(1, 7)) {
      summary(parts, k).foreach { case (w, est) =>
        val f = trueCounts(w)
        assert(est <= f, s"$w overestimated: $est > $f")
        assert(est >= f - n / (k + 1) - 1,
          s"$w underestimated beyond bound: $est < $f - ${n / (k + 1)}")
      }
    }
  }

  test("exact below capacity: k >= vocab makes the summary the exact count map") {
    val got = summary(5, vocab + 10)
    assert(got === trueCounts)
  }

  test("two-pass heavy-hitter output is partition-invariant") {
    val k = 8
    def heavies(parts: Int): Seq[(String, Long)] = {
      val toks = zipfRows.toDF("w").repartition(parts)
      val cand = toks
        .agg(count(lit(1)).as("n"), misraGries(col("w"), k).as("mg"))
        .select(col("n"), explode(map_keys(col("mg"))).as("w"))
      toks.join(broadcast(cand), Seq("w"))
        .groupBy(col("w"))
        .agg(count(lit(1)).as("cnt"), min(col("n")).as("n"))
        .filter(col("cnt") * (k + 1) > col("n"))
        .select(col("w"), col("cnt"))
        .orderBy(col("cnt").desc, col("w"))
        .as[(String, Long)].collect().toSeq
    }
    val expected = trueCounts.toSeq
      .filter { case (_, f) => f * (k + 1) > n }
      .sortBy { case (w, f) => (-f, w) }
    assert(heavies(1) === expected)
    assert(heavies(13) === expected)
  }

  test("guarantee holds over 50 random streams x random merge trees (class-level)") {
    // drive update/merge directly (no Spark jobs): random Zipf-ish
    // streams split into random partitions, merged pairwise in random
    // order — the PODS-2012 bound must survive every tree
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.types.StringType
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 50) {
      val k = 4 + rnd.nextInt(20)
      val vocab = 2 + rnd.nextInt(300)
      val n = 50 + rnd.nextInt(2000)
      val stream = Seq.fill(n)(s"w${(math.pow(rnd.nextDouble(),
        2.5) * vocab).toInt}")
      val truth = stream.groupBy(identity).map { case (w, g) =>
        (w, g.size.toLong) }
      val agg = MisraGries(BoundReference(0, StringType, nullable = true),
        Literal(k))
      val nParts = 1 + rnd.nextInt(8)
      val parts = stream.grouped(math.max(1, n / nParts)).toSeq
      var bufs = parts.map { p =>
        val b = agg.createAggregationBuffer()
        p.foreach(w => agg.update(b,
          InternalRow(UTF8String.fromString(w))))
        b
      }
      while (bufs.size > 1) { // random pairwise merge tree
        val i = rnd.nextInt(bufs.size - 1)
        val merged = agg.merge(bufs(i), bufs(i + 1))
        bufs = bufs.patch(i, Seq(merged), 2)
      }
      val got = {
        val m = scala.collection.mutable.Map.empty[String, Long]
        bufs.head.forEach((s, w) => { m(s) = w; () })
        m.toMap
      }
      assert(got.size <= k, s"trial $trial: capacity exceeded")
      val bound = n.toLong / (k + 1)
      truth.foreach { case (w, f) =>
        if (f > bound)
          assert(got.contains(w),
            s"trial $trial (k=$k n=$n): heavy $w (f=$f > $bound) missing")
        got.get(w).foreach { est =>
          assert(est <= f && est >= f - bound - 1,
            s"trial $trial: est $est out of [${f - bound}, $f] for $w")
        }
      }
      got.keys.foreach(w => assert(truth.contains(w)))
    }
  }

  test("empty input yields an empty summary") {
    val got = Seq.empty[String].toDF("w")
      .agg(misraGries(col("w"), 4).as("mg"))
      .head().getMap[String, Long](0)
    assert(got.isEmpty)
  }
}
