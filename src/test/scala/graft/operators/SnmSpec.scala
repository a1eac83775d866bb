package graft.operators

import graft.SparkSpec

/** sortedNeighborhood: the merge/purge laws — every emitted pair (a) lies
  * within the window of at least one pass's sort order, (b) carries the
  * exact distinct-word Jaccard, (c) is a subset of the exact ≥0.9
  * all-pairs ground truth (blocking never invents pairs), and the
  * two-pass union is non-trivial on the template corpus.
  */
class SnmSpec extends SparkSpec {

  private val W = 8

  private def load() = {
    val docs = spark.read
      .parquet(sf("sf0.001") + "/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val sets = docs.map { case (id, t) => id -> t.split(" ").toSet }
    (docs, sets)
  }

  private def jac(a: Set[String], b: Set[String]): Double = {
    val c = (a & b).size.toDouble
    c / (a.size + b.size - c)
  }

  test("emitted pairs: window membership, exact jaccard, subset of truth") {
    val (docs, sets) = load()
    def rankOf(key: Long => String): Map[Long, Int] =
      docs.keys.toSeq.sortBy(id => (key(id), id)).zipWithIndex.toMap
    val rHead = rankOf(id => docs(id).split(" ").take(4).mkString(" "))
    val rTail = rankOf(id => docs(id).split(" ").takeRight(4).mkString(" "))
    val got = TextOps.sortedNeighborhood(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty, "the template corpus must yield SNM pairs")
    got.foreach { case (a, b, j) =>
      assert(math.abs(j -
        math.rint(jac(sets(a), sets(b)) * 10000) / 10000) < 1e-9,
        s"pair ($a,$b): jaccard mismatch")
      assert(jac(sets(a), sets(b)) >= 0.9)
      val inWin = math.abs(rHead(a) - rHead(b)) < W ||
        math.abs(rTail(a) - rTail(b)) < W
      assert(inWin, s"pair ($a,$b) outside both sort windows")
    }
  }

  test("blocking is sound; transitive closure recovers the truth clusters") {
    val (_, sets) = load()
    val ids = sets.keys.toSeq.sorted
    val truth = (for {
      i <- ids.indices; j <- (i + 1) until ids.size
      if jac(sets(ids(i)), sets(ids(j))) >= 0.9
    } yield (ids(i), ids(j))).toSet
    val got = TextOps.sortedNeighborhood(spark, sf("sf0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(truth),
      "every emitted pair must be a true >=0.9 near-dup")
    // merge/purge's contract is the MERGE step: candidate pairs feed a
    // transitive closure, and a sorted family chains through the window
    // even though a w-window can only ever emit O(w·n) of a clique's
    // O(n²) pairs directly. Law: closure over the SNM pairs reunites
    // (almost) every truth pair — cluster recall, not raw pair recall.
    def closure(pairs: Set[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map(
        ids.map(i => i -> i): _*)
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        r
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(ra max rb) = ra min rb
      }
      ids.map(i => i -> find(i)).toMap
    }
    val comp = closure(got)
    val reunited = truth.count { case (a, b) => comp(a) == comp(b) }
    assert(truth.isEmpty || reunited * 100 >= truth.size * 95,
      s"cluster recall collapsed: $reunited of ${truth.size} truth pairs " +
        "share an SNM component")
  }
}
