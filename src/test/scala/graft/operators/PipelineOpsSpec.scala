package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic properties of the LLM-pipeline operators that the DuckDB
  * oracle can't express: sketch guarantees (MinHash recall), ANN-vs-exact
  * agreement, and stub-decode exactness.
  */
class PipelineOpsSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("identical token sets are always LSH candidates (MinHash recall = 1 at j = 1)") {
    import spark.implicits._
    val exact = TextOps.jaccardPairs(spark, dir)
      .filter($"jaccard" === 1.0).select($"a", $"b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = TextOps.minhashPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "corpus should contain identical-token-set pairs")
    assert(exact.subsetOf(cand),
      s"missed ${exact.diff(cand).size} of ${exact.size} exact-dup pairs")
  }

  test("PQ ADC top-3 is well-formed and recalls true L2 neighbors") {
    import spark.implicits._
    val top = Similarity.pqTopK(spark, dir).collect()
    val byQ = top.groupBy(_.getLong(0))
    assert(byQ.size == 10, s"expected 10 query vectors, got ${byQ.size}")
    byQ.foreach { case (q, rows) =>
      assert(rows.length == 3, s"qid $q returned ${rows.length} rows")
      assert(rows.map(_.getInt(3)).sorted.toSeq == Seq(1, 2, 3))
      assert(rows.forall(_.getLong(2) >= 0L), s"qid $q: negative ADC distance")
      assert(rows.forall(_.getLong(1) != q), s"qid $q returned itself")
    }
    // the quantizer must carry real signal: random top-3 guessing over 499
    // candidates expects ~0.2/30 hits; the 12-bit codes measure 7/30 on
    // this (near-random, so hard-for-PQ) corpus — assert well above chance
    // without pinning the exact value (deterministic, but the margin keeps
    // the test robust to corpus regeneration)
    val rec = Similarity.pqRecall(spark, dir).collect()
    assert(rec.length == 10)
    rec.foreach(r => assert(r.getLong(1) == 3L))
    val hits = rec.map(_.getLong(2)).sum
    assert(hits >= 5, s"PQ recall@3 at chance level: $hits/30 hits")
  }

  test("IVF-PQ probe = flat ADC ranking restricted to the query's cell") {
    import spark.implicits._
    val assign = Similarity.ivfAssign(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val flat = Similarity.pqTopK(spark, dir)
    val got = Similarity.ivfPqTopK(spark, dir).collect()
    val byQ = got.groupBy(_.getLong(0))
    byQ.foreach { case (q, rows) =>
      assert(rows.length <= 3 && rows.nonEmpty, s"qid $q: ${rows.length} rows")
      assert(rows.map(_.getInt(3)).sorted.toSeq == (1 to rows.length))
      rows.foreach { r =>
        val v = r.getLong(1)
        assert(v != q, s"qid $q returned itself")
        assert(assign(v) == assign(q),
          s"qid $q (cell ${assign(q)}) returned vec $v from cell ${assign(v)}")
      }
    }
    // consistency with the flat scorer: when a flat-ADC top-3 hit lies in
    // the query's cell, the composed probe must rank it at least as high
    // (same distance table, smaller candidate set)
    val gotRank = got.map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(3)).toMap
    flat.collect().foreach { r =>
      val (q, v, rn) = (r.getLong(0), r.getLong(1), r.getInt(3))
      if (assign(v) == assign(q)) {
        val cr = gotRank.get((q, v))
        assert(cr.isDefined && cr.get <= rn,
          s"flat top-$rn ($q,$v) in-cell but composed rank ${cr.orNull}")
      }
    }
  }

  test("weighted sample is size-biased: heavier docs are kept at a higher rate") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", $"n_chars".cast("long").as("w")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val M = 2147483647L
    def kept(id: Long, w: Long): Boolean =
      ((id * 52361L + 33023L) % M) % 8192L < math.min(w, 8192L)
    // inclusion rate of the heavier half should exceed the lighter half
    val sorted = docs.sortBy(_._2)
    val (light, heavy) = sorted.splitAt(sorted.length / 2)
    def rate(xs: Array[(Long, Long)]) =
      xs.count((kept _).tupled).toDouble / xs.length
    assert(rate(heavy) > rate(light),
      s"heavy rate ${rate(heavy)} !> light rate ${rate(light)}")
    // and the query's per-lang accounting matches a direct recount
    val got = Sketches.weightedSample(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    val langW = graft.sources.Tables.documents(spark, dir)
      .select($"lang", $"doc_id", $"n_chars".cast("long")).collect()
      .groupBy(_.getString(0))
    langW.foreach { case (lang, rows) =>
      val n = rows.length.toLong
      val s = rows.count(r => kept(r.getLong(1), r.getLong(2))).toLong
      assert(got(lang) == ((n, s)), s"$lang: got ${got(lang)}, want ($n, $s)")
    }
  }

  test("surprisal floors at 1 bit/token and matches its own integer accounting") {
    import spark.implicits._
    val rows = TextOps.textSurprisal(spark, dir).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val (n, bits, milli) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n >= 1L && bits >= n, s"doc ${r.getLong(0)}: bits $bits < tokens $n")
      assert(milli >= 1000L, s"doc ${r.getLong(0)}: mean $milli < 1 bit")
      assert(milli == bits * 1000L / n)
    }
  }

  test("dedup_ngram_overlap equals an in-memory recount (exact, no sketch)") {
    val M = 2147483647L
    def wordHash(w: String, init: Long, mult: Long, mod: Long): Long =
      w.foldLeft(init)((acc, c) => (acc * mult + c.toLong) % mod)
    def gram(cs: Seq[Long]): Long =
      cs.reduceLeft((acc, c) => (acc % M * 131071L + c) % M)
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val gramSets: Map[Long, Set[(Long, Long)]] = docs.map { case (id, text) =>
      val ws = text.split(" ")
      val h1 = ws.map(wordHash(_, 7L, 31L, 1000000007L)).toSeq
      val h2 = ws.map(wordHash(_, 13L, 131L, 998244353L)).toSeq
      id -> (h1.sliding(4).filter(_.length == 4).map(gram) zip
        h2.sliding(4).filter(_.length == 4).map(gram)).toSet
    }.toMap
    val df = gramSets.values.flatten.groupBy(identity).view.mapValues(_.size)
    val capped = gramSets.view
      .mapValues(_.filter(g => df(g) <= 32)).toMap
    val want = (for {
      (a, ga) <- capped.toSeq; (b, gb) <- capped.toSeq if a < b
      shared = (ga & gb).size if shared > 0
    } yield (a, b) -> shared.toLong).toMap
    assert(want.nonEmpty, "corpus should contain window-sharing pairs")
    val got = TextOps.ngramOverlapPairs(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got == want,
      s"overlap mismatch: extra=${(got.keySet -- want.keySet).take(5)} " +
        s"missing=${(want.keySet -- got.keySet).take(5)}")
  }

  test("repetition fractions equal an in-memory recount on the real corpus") {
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
    val want = docs.map { r =>
      val ws = r.getString(1).split(" ", -1)
      val n = ws.length.toLong
      val d = ws.distinct.length.toLong
      val top = ws.groupBy(identity).valuesIterator.map(_.length).max.toLong
      r.getLong(0) -> ((n, d, 1.0 - d.toDouble / n, top.toDouble / n))
    }.toMap
    val got = TextOps.repetition(spark, dir).collect()
    assert(got.length == want.size)
    got.foreach { r =>
      val (n, d, dupF, topF) = want(r.getLong(0))
      assert(r.getLong(1) == n && r.getLong(2) == d, s"doc ${r.getLong(0)}")
      assert(math.abs(r.getDouble(3) - dupF) < 5e-5, s"doc ${r.getLong(0)} dup")
      assert(math.abs(r.getDouble(4) - topF) < 5e-5, s"doc ${r.getLong(0)} top")
      // the keep verdict must gate on the op's own ROUNDED fractions
      val keepWant = if (r.getDouble(3) <= 0.55 && r.getDouble(4) <= 0.12) 1 else 0
      assert(r.getInt(5) == keepWant, s"doc ${r.getLong(0)} keep")
    }
  }

  test("gopher rule battery equals an in-memory recount on the real corpus") {
    val stops = Set("the", "be", "to", "of", "and", "that", "have", "with")
    def litOcc(w: String, m: String): Long = {
      var i = 0; var n = 0L
      while ({ i = w.indexOf(m, i); i >= 0 }) { n += 1; i += m.length }
      n
    }
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
    val want = docs.map { r =>
      val ws = r.getString(1).split(" ", -1)
      val n = ws.length.toLong
      val alpha = ws.count(w => w.exists(_.isLetter)).toLong
      val stopD = ws.filter(stops).distinct.length.toLong
      val sym = ws.map(w => litOcc(w, "#") + litOcc(w, "...")).sum
      r.getLong(0) -> ((n, ws.map(_.length.toLong).sum, alpha, stopD, sym))
    }.toMap
    val got = TextOps.gopherRules(spark, dir).collect()
    assert(got.length == want.size)
    got.foreach { r =>
      val (n, sumW, alpha, stopD, sym) = want(r.getLong(0))
      assert(r.getLong(1) == n, s"doc ${r.getLong(0)} n_words")
      assert(math.abs(r.getDouble(2) - sumW.toDouble / n) < 5e-4, "mean_wlen")
      assert(math.abs(r.getDouble(3) - alpha.toDouble / n) < 5e-5, "alpha")
      assert(math.abs(r.getDouble(4) - sym.toDouble / n) < 5e-5, "sym")
      assert(r.getLong(5) == stopD, s"doc ${r.getLong(0)} stop_distinct")
      // rule bits gate on the op's own ROUNDED fractions
      val keepWant =
        if (n >= 50 && n <= 100000 && r.getDouble(2) >= 3.0 &&
          r.getDouble(2) <= 10.0 && r.getDouble(3) >= 0.8 &&
          r.getDouble(4) <= 0.1 && stopD >= 1) 1 else 0
      assert(r.getInt(11) == keepWant, s"doc ${r.getLong(0)} keep")
    }
    // the battery must actually split this corpus (not a vacuous filter)
    val keeps = got.map(_.getInt(11)).sum
    assert(keeps > 0 && keeps < got.length, s"degenerate battery: $keeps")
  }

  test("semantic clusters equal union-find over exact cosine pairs") {
    val vecs = graft.sources.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 10000d).toLong).toArray))
    // brute-force exact pairs at the op's threshold, with its rounding
    val parent = scala.collection.mutable.Map(vecs.map(v => v._1 -> v._1): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for ((a, qa) <- vecs; (b, qb) <- vecs if a < b) {
      val dot = qa.zip(qb).map { case (x, y) => x * y }.sum.toDouble
      val cos = BigDecimal(dot / (math.sqrt(qa.map(x => x * x).sum.toDouble)
        * math.sqrt(qb.map(x => x * x).sum.toDouble)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      if (cos >= 0.45) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
    }
    val want = vecs.map(v => v._1 -> find(v._1)).toMap
    assert(want.values.toSet.size < want.size,
      "corpus should contain at least one non-trivial semantic cluster")
    val got = Similarity.semanticClusters(spark, dir).collect()
    assert(got.length == want.size)
    got.foreach { r =>
      assert(r.getLong(1) == want(r.getLong(0)), s"vec ${r.getLong(0)}")
      assert(r.getInt(2) == (if (r.getLong(0) == r.getLong(1)) 1 else 0))
    }
  }

  test("threshold curve is monotone and anchored at the candidate-pair count") {
    val rows = TextOps.thresholdCurve(spark, dir).collect()
    assert(rows.map(_.getDouble(0))
      .sameElements(Array(0.0, 0.5, 0.6, 0.7, 0.8, 0.9)))
    val ns = rows.map(_.getLong(1))
    assert(ns.zip(ns.tail).forall { case (hi, lo) => hi >= lo },
      s"curve not monotone: ${ns.mkString(",")}")
    // jaccard >= 0.0 keeps every candidate, so the anchor IS the LSH
    // candidate-pair count
    assert(ns.head == TextOps.shinglePairs(spark, dir).count())
  }

  test("simhash of identical token sets is identical") {
    import spark.implicits._
    val exact = TextOps.jaccardPairs(spark, dir).filter($"jaccard" === 1.0)
    val sh = TextOps.simhash(spark, dir)
    val joined = exact
      .join(sh.select($"doc_id".as("a"), $"simhash".as("sa")), Seq("a"))
      .join(sh.select($"doc_id".as("b"), $"simhash".as("sb")), Seq("b"))
    assert(joined.filter($"sa" =!= $"sb").count() == 0)
  }

  test("brute-force cosine top-k matches a driver-side recomputation") {
    import spark.implicits._
    val vecs = graft.sources.Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 10000).toLong).toArray)
      .toMap
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum.toDouble)
      val nb = math.sqrt(b.map(x => x * x).sum.toDouble)
      BigDecimal(dot / (na * nb)).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }
    val got = Similarity.cosineTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    for (qid <- 0L until 10L) {
      val expected = vecs.keys.filter(_ != qid).toSeq
        .map(v => (v, cos(vecs(qid), vecs(v))))
        .sortBy { case (v, c) => (-c, v) }.take(5)
      expected.zipWithIndex.foreach { case ((v, c), i) =>
        assert(got((qid, i + 1)) == ((v, c)),
          s"qid=$qid rank=${i + 1}: got ${got((qid, i + 1))}, want ($v,$c)")
      }
    }
  }

  test("LSH top-k results agree with brute force on shared candidates") {
    import spark.implicits._
    val brute = Similarity.cosineTopK(spark, dir)
      .select($"qid", $"vec_id", $"cos").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Similarity.lshTopK(spark, dir)
      .select($"qid", $"vec_id", $"cos").collect()
    // any (qid, vec) pair present in both must carry the same score
    lsh.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      brute.get(key).foreach(c => assert(c == r.getDouble(2)))
    }
  }

  test("stub decode: features are exact per-channel byte means") {
    import spark.implicits._
    val rows = Multimodal.mediaFeatures(spark, dir).limit(20).collect()
    val texts = graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val bytes = texts(id).getBytes("UTF-8")
      assert(r.getInt(1) == bytes.length)
      val want = Multimodal.stubDecode(bytes)
      val got = (0 until 8).map(b => r.getDouble(2 + b))
      assert(got.length == 8 && got.sameElements(want))
    }
  }

  test("grid-blocked near-dup join equals naive all-pairs on random vectors") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    // ids deliberately NOT 0..n-1: block assignment must not assume density
    val vecs = (0 until 60).map(i =>
      (i * 7L + 3, Array.fill(8)(rng.nextInt(2001).toLong - 1000)))
    val emb = vecs.toDF("vec_id", "q")
      .withColumn("n2", graft.functions.ArrayOps.longNorm2($"q"))
    for (blocks <- Seq(1, 3, 8)) {
      val got = Similarity.nearDupPairsOf(emb, 0.30, blocks).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val want = (for {
        (a, qa) <- vecs; (b, qb) <- vecs if a < b
        dotp = qa.zip(qb).map { case (x, y) => x * y }.sum.toDouble
        cos = BigDecimal(dotp / (math.sqrt(qa.map(x => x * x).sum.toDouble)
          * math.sqrt(qb.map(x => x * x).sum.toDouble)))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        if cos >= 0.30
      } yield (a, b, cos)).toSet
      assert(got == want, s"blocks=$blocks")
    }
  }

  test("stub resize: nearest-neighbor bytes at floor(j*n/16)") {
    import spark.implicits._
    val rows = Multimodal.mediaResize(spark, dir).limit(10).collect()
    val texts = graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val bytes = texts(r.getLong(0)).getBytes("UTF-8")
      val want = Multimodal.stubResize(bytes, 16)
      assert((0 until 16).forall(j => r.getInt(2 + j) == want(j)))
    }
  }

  test("frame sampler emits every 4th complete 8-byte frame's mean") {
    import spark.implicits._
    val byDoc = Multimodal.frameSample(spark, dir).collect()
      .groupBy(_.getLong(0))
    val texts = graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val (id, got) = byDoc.head
    val bytes = texts(id).getBytes("UTF-8")
    val wantIdx = (0 until bytes.length / 8 by 4)
    assert(got.map(_.getInt(1)).sorted.sameElements(wantIdx))
    got.foreach { r =>
      val f = r.getInt(1)
      val mean = (f * 8 until f * 8 + 8).map(bytes(_) & 0xff).sum / 8.0
      assert(r.getDouble(2) == mean)
    }
  }
}
