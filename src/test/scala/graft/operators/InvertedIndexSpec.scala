package graft.operators

import graft.SparkSpec
import graft.sources.Tables

/** invertedIndex: certified by a full in-memory recompute (plain Scala
  * collections) of df and the capped posting lists, plus the structural
  * laws — postings sorted ascending, capped at 20, and always a prefix of
  * the full sorted posting list for the term.
  */
class InvertedIndexSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("df and capped postings match an in-memory recompute exactly") {
    import spark.implicits._
    val got = TextOps.invertedIndex(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap

    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val postings = docs
      .flatMap { case (id, text) => text.split(" ").distinct.map(_ -> id) }
      .groupBy(_._1)
      .map { case (w, v) => w -> v.map(_._2).sorted }

    val expect = postings.map { case (w, ids) =>
      w -> ((ids.length.toLong, ids.take(20).mkString(",")))
    }
    assert(got == expect)

    // structural laws on the Spark output alone
    got.foreach { case (term, (df, ps)) =>
      val ids = ps.split(",").map(_.toLong)
      assert(ids.length == math.min(df, 20L),
        s"$term: ${ids.length} postings for df=$df")
      assert(ids.sameElements(ids.sorted), s"$term postings unsorted")
    }
    assert(got.values.exists(_._1 > 20), "no term exercised the cap")
  }
}
