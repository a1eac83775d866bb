package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Laws of the exact-substring removal pass (text_dup_spans /
  * text_dup_span_cuts): hand-built corpora with KNOWN duplicated
  * passages (cross-doc, intra-doc, adjacent-merge), structural span
  * laws on real data, stats ≡ cuts rollup, and a full independent
  * re-derivation of the span set from raw 8-gram STRINGS (a different
  * identity channel than the shipped dual polynomial fingerprint — so
  * this also certifies collision-freeness at spec scale).
  */
class TextDupSpansSpec extends SparkSpec {
  import spark.implicits._

  private val dir = sf("sf0.001")
  private val n = 8

  private def spansOf(docs: Seq[(Long, String)]) =
    TextOps.dupSpansOf(docs.toDF("doc_id", "text"))
      .orderBy($"doc_id", $"span_start")
      .select($"doc_id", $"span_start", $"span_end", $"span_words",
        $"gram_hits", $"total_words")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq

  test("cross-doc shared passage -> one maximal span per doc") {
    val passage = (1 to 12).map(i => s"p$i").mkString(" ")
    val docs = Seq(
      0L -> s"a1 a2 a3 a4 $passage a5 a6 a7", // passage at words 5..16
      1L -> s"$passage b1 b2 b3 b4 b5") //        passage at words 1..12
    // 12-word passage, n=8 -> 5 duplicated positions per doc, merging
    // into exactly the passage's word range
    assert(spansOf(docs) === Seq(
      (0L, 5L, 16L, 12L, 5L, 19L),
      (1L, 1L, 12L, 12L, 5L, 17L)))
  }

  test("intra-doc repetition duplicates against itself (per the paper)") {
    val phrase = (1 to n).map(i => s"x$i").mkString(" ")
    val docs = Seq(0L -> s"$phrase f1 f2 f3 $phrase")
    // the 8-gram occurs at pos 1 and pos 12 of the SAME doc -> two
    // disjoint spans, one hit each
    assert(spansOf(docs) === Seq(
      (0L, 1L, 8L, 8L, 1L, 19L),
      (0L, 12L, 19L, 8L, 1L, 19L)))
  }

  test("adjacent covered intervals merge into one span") {
    val y = (1 to n).map(i => s"y$i").mkString(" ")
    val z = (1 to n).map(i => s"z$i").mkString(" ")
    val docs = Seq(
      0L -> s"$y $z", //          y-gram at pos 1, z-gram at pos 9
      1L -> s"$y e1 e2 e3 e4 e5 e6 e7 e8",
      2L -> s"e9 e10 e11 e12 e13 e14 e15 e16 $z")
    // doc 0: intervals [1,8] and [9,16] are adjacent -> ONE span [1,16]
    val d0 = spansOf(docs).filter(_._1 == 0L)
    assert(d0 === Seq((0L, 1L, 16L, 16L, 2L, 16L)))
  }

  test("a unique corpus yields no spans; short docs are safe") {
    val docs = Seq(
      0L -> (1 to 20).map(i => s"u$i").mkString(" "),
      1L -> "v1 v2 v3") // shorter than n: no window at all
    assert(spansOf(docs).isEmpty)
  }

  private lazy val cuts = TextOps.dupSpanCuts(spark, dir)
    .as[(Long, Long, Long, Long, Long)].collect().toSeq
  private lazy val stats = TextOps.dupSpanStats(spark, dir).collect()

  test("span structure on real data: disjoint, non-adjacent, in-bounds") {
    assert(cuts.nonEmpty) // the corpus genuinely duplicates
    val totals = stats.map(r => r.getLong(0) -> r.getLong(3)).toMap
    cuts.groupBy(_._1).foreach { case (doc, ss) =>
      val sorted = ss.sortBy(_._2)
      sorted.foreach { case (_, a, b, w, hits) =>
        assert(a >= 1L && b <= totals(doc))
        assert(w === b - a + 1 && w >= n.toLong)
        assert(hits >= 1L && hits <= w - (n - 1))
      }
      // maximality: merged spans can't touch (gap of >= 2 words)
      sorted.sliding(2).foreach {
        case Seq(p, q) => assert(q._2 > p._3 + 1, s"doc $doc")
        case _ =>
      }
    }
  }

  test("stats are exactly the cuts rollup") {
    val roll = cuts.groupBy(_._1).map { case (doc, ss) =>
      doc -> ((ss.size.toLong, ss.map(_._4).sum))
    }
    assert(stats.length === roll.size)
    stats.foreach { r =>
      val (ns, dw) = roll(r.getLong(0))
      assert(r.getLong(1) === ns && r.getLong(2) === dw, r)
      assert(r.getLong(4) === 1000L * dw / r.getLong(3), r)
    }
  }

  private lazy val applied = TextOps.dupSpanApply(spark, dir)
    .as[(Long, String, Long, Long)].collect().toSeq

  test("apply: conservation, stats agreement, untouched round-trip") {
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .toMap
    val dup = stats.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(applied.map(_._1).toSet === docs.keySet)
    applied.foreach { case (doc, clean, kept, cut) =>
      val ws = docs(doc).split(" ", -1)
      assert(kept + cut === ws.length.toLong, doc)
      assert(cut === dup.getOrElse(doc, 0L), doc)
      if (cut == 0L) assert(clean === docs(doc), doc) // bit round-trip
      else {
        // the cleaned text is the original minus exactly the cut spans
        val cutRanges = cuts.filter(_._1 == doc)
        val keptWords = ws.zipWithIndex.collect {
          case (w, i) if !cutRanges.exists(r =>
            i + 1 >= r._2 && i + 1 <= r._3) => w
        }
        assert(clean === keptWords.mkString(" "), doc)
      }
    }
    assert(applied.exists(_._4 > 0L)) // the removal actually removed
  }

  test("span set matches an independent string-channel re-derivation") {
    // raw 8-gram STRINGS as window identity (no fingerprints), islands
    // re-implemented in plain Scala — agreement certifies both the
    // island window logic and fingerprint collision-freeness here
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val grams = docs.flatMap { case (doc, text) =>
      val ws = text.split(" ", -1)
      ws.indices.dropRight(n - 1).map(i =>
        (doc, i + 1L, ws.slice(i, i + n).mkString(" ")))
    }
    val occ = grams.groupBy(_._3).view.mapValues(_.size).toMap
    val expected = grams.filter(g => occ(g._3) >= 2)
      .groupBy(_._1).toSeq.flatMap { case (doc, hs) =>
        val spans = hs.map(_._2).sorted.foldLeft(
          List.empty[(Long, Long, Long)]) {
          case ((a, b, k) :: rest, p) if p <= b + 1 =>
            (a, math.max(b, p + (n - 1)), k + 1) :: rest
          case (acc, p) => (p, p + (n - 1), 1L) :: acc
        }
        spans.reverse.map { case (a, b, k) =>
          (doc, a, b, b - a + 1, k)
        }
      }.sortBy(t => (t._1, t._2))
    assert(cuts === expected)
  }
}
