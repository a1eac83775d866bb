package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off scaling-slope harness: times the most expensive queries at the
  * sf0.1 corpus and at a ~10× synthetic blow-up, to verify the banded /
  * contracted operators scale near-linearly in rows (the 100 TB claim,
  * measured instead of argued from the plan).
  *
  * The 10× corpus is NOT naive replication — copying documents verbatim
  * would put 10 identical docs in every LSH bucket and inflate pair output
  * quadratically, measuring a different (denser) problem. Instead each of
  * the `mult` shards gets a disjoint token vocabulary (every word suffixed
  * with the shard id), so each shard reproduces the original corpus's
  * intra-shard similarity structure exactly (token remapping is a bijection,
  * Jaccard/shingle overlaps are preserved) and cross-shard similarity is
  * zero: pair volume and row count both scale by exactly `mult`, which is
  * what a linear-in-data slope should be measured against. Embeddings are
  * replicated with offset ids (the cosine/IVF query set is pinned to
  * vec_id < 10, so query count stays constant while data grows).
  *
  * The Aria scenario reads no corpus table; its 10× point scales the
  * workload itself (keys, txns, keyspace all ×mult, holding conflict
  * density roughly constant).
  *
  * Usage: `sbt "runMain graft.ScalingBench"` — writes the scaled corpus
  * under tmp/ (gitignored) on first run, prints one JSON line per
  * (query, scale) with rows and seconds, then a summary slope table.
  * Results are recorded in PLANS.md §scaling.
  */
object ScalingBench {
  // cache generations: bump corpusGen whenever the corpus layout changes
  // (v2 = every shard remapped), zorderGen whenever the z-order table
  // construction changes (z1 = 10-bit min/max normalization) — stale
  // caches rebuild instead of being silently re-measured
  // v3: embeddings get per-shard ±1 sign transforms (see buildCorpus) so
  // scaled pair-emitter slopes measure a scaled problem, not a denser one
  // v4 (mult > 10 only; ≤10 output is byte-identical to v3, so those
  // caches stay valid): shard suffixes become "s" + a shard-UNIQUE single
  // character from a 100-char alphabet, restoring the cross-shard
  // token-inequality contract at 100 shards — see shardChar
  private val corpusGen = "v3"

  /** One shard-unique suffix character per shard, for up to 100 shards.
    * The contract buildCorpus needs is cross-shard inequality IN
    * tokenCode SPACE — (first-3 chars, length, LAST char) — not just
    * string inequality. Suffixes are all "s"+c (equal length, so the
    * length digit never separates shards), which means the LAST character
    * alone must distinguish all shards: variable-length suffixes like
    * "s15"/"s25" collide on (length, last='5') — the ×100 densification
    * PLANS.md measured (1,280,200 pairs vs the linear 25,600); and the
    * r13-verdict-suggested zero-padding ("s15" vs "s25" stays equal-length
    * with equal last char) would NOT fix it. 100 distinct chars, all with
    * codepoint < 256 so the base-256 last-char digit of tokenCode stays
    * injective: digits + ASCII letters (62) + Latin-1 letters À..å (38).
    * Shards 0–9 keep '0'..'9', so ≤10-shard corpora are byte-identical
    * to v3. Spark-only corpus (probes never hit the DuckDB oracle).
    */
  private[graft] val shardAlphabet: String =
    ('0' to '9').mkString + ('a' to 'z').mkString + ('A' to 'Z').mkString +
      (192 to 230).filterNot(_ == 215).map(_.toChar).mkString // À..æ, <256, skip ×
  private val zorderGen = "z1"

  private def f3(v: Double): String =
    "%.3f".formatLocal(java.util.Locale.ROOT, v)

  private def buildCorpus(spark: SparkSession, base: String, out: String,
      mult: Int): Unit = {
    // the marker carries the corpusGen suffix (see the constants above):
    // machines holding a pre-change cache rebuild instead of silently
    // measuring the old layout. mult > 10 carries the v4 suffix scheme
    // (the ≤10 output is byte-identical, so its v3 caches stay valid).
    require(mult <= shardAlphabet.length,
      s"buildCorpus supports at most ${shardAlphabet.length} shards")
    val gen = if (mult <= 10) corpusGen else corpusGen + "-pad100"
    val done = new java.io.File(s"$out/_DONE_$gen")
    if (done.exists()) return
    val docs = spark.read.parquet(s"$base/documents.parquet")
    val nDocs = docs.agg(max("doc_id")).head().getLong(0) + 1
    docs.withColumn("shard", explode(sequence(lit(0), lit(mult - 1))))
      .select(
        (col("doc_id") + col("shard") * nDocs).as("doc_id"),
        // EVERY shard (including 0) remaps into a shard-private vocabulary:
        // suffixes are "s" + one shard-UNIQUE character (see shardAlphabet
        // — equal length for all shards, last char distinct across all
        // 100 shards), so cross-shard token equality is impossible by
        // construction IN tokenCode SPACE, not just as strings — no
        // assumption about the base alphabet (keeping shard 0 unmapped
        // would collide if a base token ever ended in "s<digit>")
        concat_ws(" ",
          transform(split(col("text"), " "),
            w => concat(w, lit("s"),
              lit(shardAlphabet).substr(col("shard") + 1, lit(1)))))
          .as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val emb = spark.read.parquet(s"$base/embeddings.parquet")
    val nVec = emb.agg(max("vec_id")).head().getLong(0) + 1
    emb.withColumn("shard", explode(sequence(lit(0), lit(mult - 1))))
      .select((col("vec_id") + col("shard") * nVec).as("vec_id"),
        // per-shard diagonal ±1 transform (the embedding analogue of the
        // documents' vocabulary sharding): flipping dim i of shard s by a
        // hash bit preserves every INTRA-shard dot product and norm
        // exactly (the signs cancel), so each shard reproduces the base
        // corpus's similarity structure bit-for-bit, while ANY two
        // distinct shards disagree on ~half the dims, scrambling
        // cross-shard cosines to ≈0 (±1/√64). Without this, replicated
        // vectors are exact near-dups of each other and a ×mult corpus
        // carries ×mult² true pairs — a denser problem, not a scaled one.
        // Shard 0 keeps the identity transform (hash of s = 0 is 0 for
        // all i), so the 1x slice embedded in the corpus is unchanged.
        // bit (i mod 31) of shard*knuth via exact double arithmetic
        // (shard*C < 2^35 ≪ 2^53, division by 2^k is exact scaling) —
        // shiftright() takes only literal shift counts
        transform(col("embedding"), (x, i) =>
          x * (lit(1) - lit(2) * pmod(
            floor(col("shard") * 2654435761L
              / pow(lit(2.0), pmod(i, lit(31)))).cast("long"),
            lit(2L)).cast("int")))
          .as("embedding"),
        col("label"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    done.getParentFile.mkdirs()
    done.createNewFile()
    ()
  }

  /** Law check for the v4 suffix scheme, runnable standalone and asserted
    * by ScalingBenchCorpusSpec: every shard pair must differ in the LAST
    * suffix character (the only tokenCode digit equal-length suffixes can
    * differ in), with all codepoints < 256 and none a space.
    */
  private[graft] def shardSuffixContractHolds(n: Int): Boolean = {
    val cs = shardAlphabet.take(n)
    cs.length == n && cs.distinct.length == n &&
      cs.forall(c => c.toInt < 256 && c != ' ')
  }

  /** Zipf-HONEST scale-up: verbatim document replication (doc_id offset
    * only, text unchanged), so every term's document frequency grows
    * ×mult with the corpus — the df growth a natural corpus scale-up
    * produces. The vocabulary-sharded corpus above deliberately holds df
    * constant (each shard gets a private vocabulary) to keep pair-emitter
    * problems scaled-not-densified; the flip side (VERDICT r12 "missing"
    * #1) is that posting-list-shaped plans are never stressed by df
    * growth under it. This corpus is the complement: similarity-shaped
    * queries would densify quadratically on it (do NOT measure them
    * here), but posting-shaped plans see exactly the head-term growth a
    * real corpus delivers. Probes stay pinned (doc_id < 10 = shard 0).
    */
  private def buildZipfCorpus(spark: SparkSession, base: String,
      out: String, mult: Int): Unit = {
    val done = new java.io.File(s"$out/_DONE_zipf_v1")
    if (done.exists()) return
    val docs = spark.read.parquet(s"$base/documents.parquet")
    val nDocs = docs.agg(max("doc_id")).head().getLong(0) + 1
    docs.withColumn("shard", explode(sequence(lit(0), lit(mult - 1))))
      .select((col("doc_id") + col("shard") * nDocs).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    done.getParentFile.mkdirs()
    done.createNewFile()
    ()
  }

  /** Scaled RELATIONAL corpus for the dq_* probes: the four tables
    * dq_constraints scans (nation, customer, orders, lineitem),
    * replicated ×mult with per-KEYSPACE offsets (nationkey / custkey /
    * orderkey, each sized by its owning table) so primary-key uniqueness
    * and every referential-integrity edge are PRESERVED by construction —
    * naive replication would turn the uniqueness checks into a different
    * (constant-group-count) problem and flood the RI anti-joins with
    * duplicate keys. Check outcomes therefore scale with the data
    * (n_bad ×mult), which is what a single-pass audit claim must be
    * measured against.
    */
  private def buildRelCorpus(spark: SparkSession, base: String,
      out: String, mult: Int): Unit = {
    // the part CATALOG is deliberately NOT multiplied (the honest basket
    // scale-up: same products, more transactions) — copied verbatim for
    // part-reading probes (rec_coverage's coverage denominator); its own
    // guard so pre-existing corpora gain it without a rebuild
    val partOut = new java.io.File(s"$out/part.parquet")
    if (!partOut.exists()) {
      spark.read.parquet(s"$base/part.parquet")
        .write.mode("overwrite").parquet(s"$out/part.parquet")
    }
    val done = new java.io.File(s"$out/_DONE_rel_v1")
    if (done.exists()) return
    def keyMax(tbl: String, c: String): Long =
      spark.read.parquet(s"$base/$tbl.parquet")
        .agg(max(col(c).cast("long"))).head().getLong(0) + 1
    val spaces = Seq(
      "nationkey" -> keyMax("nation", "n_nationkey"),
      "custkey" -> keyMax("customer", "c_custkey"),
      "orderkey" -> keyMax("orders", "o_orderkey"))
    for (t <- Seq("nation", "customer", "orders", "lineitem")) {
      val df = spark.read.parquet(s"$base/$t.parquet")
      val outCols = df.columns.map { c =>
        spaces.collectFirst { case (suf, sp) if c.endsWith(suf) =>
          (col(c) + col("shard") * sp).as(c)
        }.getOrElse(col(c))
      }
      df.withColumn("shard", explode(sequence(lit(0), lit(mult - 1))))
        .select(outCols.toIndexedSeq: _*)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    done.getParentFile.mkdirs()
    done.createNewFile()
    ()
  }

  /** Inline-scaled events (user/event keyspaces offset per shard, same
    * calendar) — shared by the s3/s4 probe blocks.
    */
  private def buildEventsCorpus(spark: SparkSession, base: String,
      evOut: String, mult: Int): Unit = {
    if (new java.io.File(s"$evOut/_DONE_v1").exists()) return
    val ev = spark.read.parquet(s"$base/events.parquet")
    val nEv = ev.agg(max("event_id")).head().getLong(0) + 1
    val nUser = ev.agg(max("user_id")).head().getLong(0) + 1
    ev.withColumn("shard", explode(sequence(lit(0), lit(mult - 1))))
      .select((col("event_id") + col("shard") * nEv).as("event_id"),
        col("ts"), (col("user_id") + col("shard") * nUser).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$evOut/events.parquet")
    new java.io.File(s"$evOut/_DONE_v1").createNewFile()
    ()
  }

  /** min-of-iters wall seconds + result rows for one DataFrame builder. */
  private def time(iters: Int)(build: => DataFrame): (Double, Long) = {
    var rows = 0L
    val secs = (1 to iters).map { _ =>
      val t0 = System.nanoTime()
      rows = build.count()
      (System.nanoTime() - t0) / 1e9
    }.min
    (secs, rows)
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = if (args.length > 1) args(1).toInt else 10
    val out = s"tmp/sfx$mult"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "30s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    buildCorpus(spark, base, out, mult)

    // measurement protocol: SMALL-OUTPUT points first, the two big pair
    // emitters (hundreds of millions of output rows at 10×) LAST — their
    // memory/GC pressure lingers in the JVM and was measured to inflate a
    // code-identical query run right after them by 5×
    // optional 3rd arg: comma-separated corpus-query filter (re-measure a
    // single point without re-paying the full run; aria/zorder skipped
    // when a filter is given)
    val onlyQs = if (args.length > 2)
      Some(args(2).split(",").map(_.trim).filter(_.nonEmpty).toSet)
    else None
    val corpusQs = Seq("dedup_clusters", "sim_ivf_topk",
      "dedup_cdc_chunks",
      "pipeline_keep_manifest",
      // round-10 additions: SQ8 probe (scan-linear claim), windowed
      // collocation mining (O(window·tokens) emit claim), contracted-graph
      // BFS (per-round join over ×mult edges; rounds fixed at 3)
      "sim_sq_topk", "text_cooccur_lift", "graph_bfs_reach",
      // round-10 session additions: vocab-window Zipf audit (corpus pass +
      // vocab-sized rank window), token-balanced sharding (the global-sort
      // scale question), contracted-graph k-core (per-round join+agg,
      // rounds fixed at 4), MMR rerank (corpus candidate fetch + bounded
      // pool greedy). text_rake_phrases is NOT here: the shard-suffixed
      // vocabulary removes its 'a'/'the' delimiters, so the 10× corpus
      // degenerates to one unsegmentable run per doc — its scale shape
      // (one gaps-and-islands window + token-keyed aggs) is the measured
      // text_cooccur_lift shape
      "text_zipf_curve", "sample_shard_assign", "graph_kcore",
      "sim_mmr_rerank",
      // round-10 session-3 additions: first-occurrence novelty (content-
      // keyed min-agg + join back — the exact-dedup shuffle shape, no pair
      // emission), per-node clustering coefficient (MPS wedge close over
      // the contracted graph)
      "text_ngram_novelty", "graph_clustering_coeff",
      // session-3 wave 2: banding calibration (3 banded joins + candidate-
      // bounded intersections over one signature pass), cluster-hash split
      // (star-contraction + one agg), text-LSH × media-phash agreement
      // (bounded pair frame + two co-keyed hash joins), nearest-class-mean
      // probe (embedding side: broadcast centroids, |labels|× exploded fan)
      "dedup_lsh_tuning", "sample_leakage_split", "mm_crossmodal_dups",
      "sim_nearest_centroid",
      "dedup_ngram_overlap", "dedup_jaccard_pairs",
      "dedup_simhash_wide_pairs",
      "dedup_simhash_pairs", "dedup_minhash_pairs",
      // round-12 session-3: exact-substring removal (ONE content-keyed
      // window count over positional grams + doc-keyed island fold — the
      // claim is linear-in-tokens whatever the duplication structure;
      // vocabulary sharding preserves intra-shard dup spans exactly, so
      // span output scales by exactly mult)
      "text_dup_spans",
      // hybrid RRF: vector channel corpus-linear (bounded probe
      // broadcast), lexical channel bounded by probe vocab × df — df is
      // shard-constant under vocabulary sharding, so lexical should read
      // FLAT while the vector scan scales; knn classify: fixed 100-vector
      // eval broadcast against a ×mult train corpus (pure scan term)
      "sim_hybrid_rrf", "sim_knn_classify",
      // round-13: SNM (two range-sorts + rank-keyed window pairing —
      // candidate volume (w−1)·N by construction); ANF (per-round edge
      // join + register max, rounds fixed at 3 → linear in |E|); LPA +
      // modularity (per-round edge⋈label join + two keyed argmax aggs,
      // rounds fixed at 3 → linear in |E|, same claim shape as ANF)
      "dedup_sorted_neighborhood", "graph_anf", "graph_lpa_modularity",
      // Borůvka MSF: rounds ≤ log₂(largest component) — constant under
      // vocabulary sharding (components replicate, never merge), so the
      // slope isolates the per-round edge-tagging + contraction cost;
      // single-linkage: the same jaccardEdges weight term + one CC on
      // the τ-pruned subgraph; PPR: 3 BSP rounds over the pinned edge
      // list — per-round one edge⋈rank join, linear in |E| (seed count
      // scales with docs under sharding, so teleport mass does too)
      "graph_mst", "dedup_single_linkage", "graph_ppr", "graph_pagerank",
      // the contracted-graph PPR — the production form whose slope the
      // doc-level ×27 finding motivates — and its plain-PageRank sibling
      // (r14: same pageRankBsp core, uniform teleport)
      "graph_ppr_groups", "graph_pagerank_groups",
      // r14 wave: TextRank (window pass + vocab-bounded BSP), winnowing
      // (positional window pass + df-pruned fingerprint join), sparse LSA
      // (nnz-proportional ping-pong), Katz + RA (group-graph keyed
      // joins/wedges — both should read near-flat under sharding)
      "text_textrank_terms", "text_winnowing", "text_lsa_power",
      "graph_katz", "graph_resource_alloc",
      // r15 wave: burstiness (posting moment fold), KMV (distinct +
      // top-k-by-hash, merge on <=2k rows), silhouette (n·k broadcast
      // fan + keyed aggs) — all predicted near-linear scan shapes
      "text_burstiness", "sketch_kmv_intersect", "sim_silhouette")
      .filter(q => onlyQs.forall(_.contains(q)))
    val report = scala.collection.mutable.ArrayBuffer.empty[String]

    // Aria first (same protocol: it is small-output too, and must not pay
    // the emitters' leftover pressure): workload-parameterized 10× (no
    // corpus input)
    import graft.aria.{AriaEngine, TxnGen}
    // runs by default AND when named explicitly in the filter (r14: the
    // ×100 s/epoch decade — VERDICT r13 item 7 — is a filtered run)
    for ((tag, k) <- Seq("1x" -> 1, s"${mult}x" -> mult)
         if onlyQs.forall(_.contains("aria_reference_scenario"))) {
      val (secs, rows) = time(iters) {
        import spark.implicits._
        val table = TxnGen.bulkLoad(spark, 200000L * k)
          .select($"k", $"fields" (0).as("f0")).localCheckpoint(true)
        val ops = TxnGen.ops(spark, 150L * k,
          TxnGen.Config(keysMax = 20000L * k)).localCheckpoint(true)
        val nv = (tid: org.apache.spark.sql.Column,
            ep: org.apache.spark.sql.Column) =>
          concat(lit("v"), tid.cast("string"), lit("e"), ep.cast("string"))
        // same shared-liveOps shape as the shipped ariaReferenceScenario:
        // the live filter + tid count are policy-independent, computed once
        val live = AriaEngine.liveOps(ops, table).localCheckpoint(true)
        val nTids = ops.select($"tid").distinct().count()
        val runs = Seq(true, false).map { reorder =>
          val (_, history) = AriaEngine.runLive(
            spark, table, live, nTids, reorder, Seq("f0"), nv)
          history.map { case (e, c, a) =>
            (if (reorder) "reorder" else "noreorder", e, c, a)
          }
        }
        runs.flatten.toDF("mode", "epoch", "committed", "aborted")
      }
      // rows = executed epochs summed over the two policies, so sec/rows
      // is the mean per-epoch wall — the deferred-install + broadcast-
      // verdict design predicts it near-flat in keys/txns
      val line =
        s"""{"query":"aria_reference_scenario","scale":"$tag",""" +
          s""""sec":${f3(secs)},"rows":$rows,""" +
          s""""sec_per_epoch":${f3(secs / math.max(1L, rows))}}"""
      println(line)
      report += line
    }

    // incremental view maintenance: refresh-vs-recompute economics. The
    // claim (Materialized.scala): refreshing a count/sum rollup from a
    // pre-materialized view costs O(|delta| + |view|) while recompute
    // costs O(|base|) — so under a CONSTANT-size delta (shard 0's CDC
    // day) recompute's wall must grow with the base and refresh's must
    // stay flat. Orders are small enough to scale inline (no parquet
    // cache): x1/x10/x100 via disjoint key shards, checkpointed so both
    // paths read equally-materialized inputs; the view build is NOT
    // timed (a deployment reads it back from storage).
    if (onlyQs.forall(_.contains("mv_incremental_agg"))) {
      import graft.operators.Materialized
      val ordersBase = spark.read.parquet(s"$base/orders.parquet")
      val nOrd = ordersBase.agg(max("o_orderkey")).head().getLong(0) + 1
      val nCust = ordersBase.agg(max("o_custkey")).head().getLong(0) + 1
      val splitTs = lit("1999-07-01").cast("timestamp")
      for (m <- Seq(1, 10, 100)) {
        val scaled = ordersBase
          .withColumn("shard", explode(sequence(lit(0), lit(m - 1))))
          .select((col("o_orderkey") + col("shard") * nOrd).as("rid"),
            (col("o_custkey") + col("shard") * nCust).as("key"),
            round(col("o_totalprice") * 100).cast("long").as("x"),
            col("o_orderdate"), col("o_orderstatus"))
        val baseRows = scaled.filter(col("o_orderdate") < splitTs)
          .select("key", "rid", "x").repartition(32).localCheckpoint(true)
        // constant-size delta across scales: shard 0's rows only
        val ins = scaled.filter(col("o_orderdate") >= splitTs
            && col("rid") < nOrd)
          .select("key", "rid", "x").localCheckpoint(true)
        val del = scaled.filter(col("o_orderdate") < splitTs
            && col("o_orderstatus") === "F" && col("rid") % 7 === 0
            && col("rid") < nOrd)
          .select("key", "rid", "x").localCheckpoint(true)
        val view = baseRows.groupBy(col("key"))
          .agg(count(lit(1)).as("n"), sum("x").as("s"))
          .localCheckpoint(true)
        val (rSec, rRows) = time(iters) {
          Materialized.refreshCountSum(view, ins.select("key", "x"),
            del.select("key", "x"), "key")
        }
        val (cSec, cRows) = time(iters) {
          baseRows.join(del.select("rid"), Seq("rid"), "left_anti")
            .unionByName(ins)
            .groupBy(col("key"))
            .agg(count(lit(1)).as("n"), sum("x").as("s"))
        }
        require(rRows == cRows,
          s"refresh/recompute row mismatch at x$m: $rRows vs $cRows")
        for ((q, sec, rows) <- Seq(("mv_refresh", rSec, rRows),
            ("mv_recompute", cSec, cRows))) {
          val line =
            s"""{"query":"$q","scale":"${m}x","sec":${f3(sec)},"rows":$rows}"""
          println(line)
          report += line
        }
      }
    }

    // zone-map + z-order composition: a point probe on a z-ordered,
    // zone-mapped VersionedTable must open ~O(1) files while the table
    // (and its file count) grows ×mult — the claim LayoutSpec proves at
    // sf0.01, measured here at 10×. Layout exactly as LayoutSpec/compact's
    // range-cluster branch: z column → range partition → in-file sort →
    // commit with stats (file count scales with data, ×8 per 1×).
    // the zorder block participates in a filtered run when the filter names
    // it explicitly (the O(√F) law gains most from an extra decade of scale)
    for ((tag, dir, nFiles) <- Seq(("1x", base, 8), (s"${mult}x", out, 8 * mult))
         if onlyQs.forall(_.contains("scan_pruned_zorder"))) {
      import graft.sources.{Layout, VersionedTable}
      // absolute path: the COW commit's atomic rename resolves relative
      // paths inconsistently between the Hadoop FS and the parquet writer.
      // The path carries BOTH generation stamps (corpus + z layout): a
      // corpus rebuild or a layout-code change lands in a fresh directory
      // instead of silently re-measuring a stale cached table.
      val path = new java.io.File(
        s"$out/zorder_${corpusGen}_${zorderGen}_$tag/t").getAbsolutePath
      if (VersionedTable.latestVersion(spark, path).isEmpty) {
        // normalize n_chars to long: the scaled corpus stores it int32 and
        // zone-map probes only prune on an exact type match
        val docs = spark.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"))
        // z-order needs BOTH dims on the same bit range: doc_id spans 16
        // bits at 10× while n_chars spans ~10, and raw interleaving lets
        // the wider dim's high bits dominate — the layout degenerates to a
        // doc_id sort and the other dim never prunes. Min/max-normalize
        // each dim to 10 bits before interleaving (at 100 TB the same
        // normalization comes from table stats / approx quantiles).
        val st = docs.agg(min("doc_id"), max("doc_id"),
          min("n_chars"), max("n_chars")).head()
        // explicit floor + cast: `/` on longs is double division in Spark,
        // and relying on zOrder2's internal cast("long") to truncate the
        // fraction would couple correctness to that implementation detail
        def norm(c: Column, lo: Long, hi: Long): Column =
          floor((c - lo) * 1024L / (hi - lo + 1L)).cast("long")
        val z = docs
          .withColumn("z", Layout.zOrder2(
            norm(col("doc_id"), st.getLong(0), st.getLong(1)),
            norm(col("n_chars"), st.getLong(2), st.getLong(3)), 10))
          .repartitionByRange(nFiles, col("z"))
          .sortWithinPartitions("z")
          .drop("z")
        VersionedTable.init(z, path, statsCols = Seq("doc_id", "n_chars"))
      }
      val probeId = 4321L
      val (kId, tId) = VersionedTable.prunedFiles(spark, path, "doc_id",
        probeId, probeId)
      // the z-order claim: the NON-leading dimension prunes too
      val (kNc, tNc) = VersionedTable.prunedFiles(spark, path, "n_chars",
        100L, 120L)
      val (secs, rows) = time(iters)(
        VersionedTable.scanPruned(spark, path, "doc_id", probeId, probeId))
      val line = s"""{"query":"scan_pruned_zorder","scale":"$tag",""" +
        s""""sec":${f3(secs)},"rows":$rows,"files_opened_id":$kId,""" +
        s""""files_total":$tId,"files_opened_nchars":$kNc,"files_total_nchars":$tNc}"""
      println(line)
      report += line
    }

    // BPE trainer scaling (opt-in via a filter naming "bpe_train"): the
    // replace-form chain is O(rounds × corpus) by construction; the
    // pair-cache incremental form pays one up-front corpus shuffle and
    // then per-round work ∝ docs containing the merged pair. The
    // 128-round replace point is deliberately absent — that is exactly
    // the configuration the cache exists to make feasible.
    if (onlyQs.exists(_.contains("bpe_train"))) {
      import graft.operators.TextOps
      for ((tag, dir) <- Seq("1x" -> base, s"${mult}x" -> out);
           rounds <- Seq(8, 32, 128);
           (form, run) <- Seq(
             "replace" ->
               (() => TextOps.bpeTrain(spark, dir, rounds)),
             "paircache" ->
               (() => TextOps.bpeTrainIncremental(spark, dir, rounds)))
           if !(form == "replace" && rounds > 32)) {
        val (secs, rows) = time(iters)(run())
        val line = s"""{"query":"bpe_train_$form","scale":"$tag",""" +
          s""""rounds":$rounds,"sec":${f3(secs)},"rows":$rows}"""
        println(line)
        report += line
      }
    }

    // Hybrid-RRF lexical channel under Zipf-honest scaling (opt-in via
    // "hybrid_lex"): capped (df-pruned, broadcast probe terms — the gate
    // form) vs uncapped (raw term-keyed posting join — the pre-r13 form,
    // kept as a measurement control) on the verbatim-replication corpus
    // where df grows ×mult. Both forms pay the same corpus word pass;
    // the delta is the posting-join fan the df prune removes.
    if (onlyQs.exists(_.contains("hybrid_lex"))) {
      val zout = s"tmp/zipf$mult"
      buildZipfCorpus(spark, base, zout, mult)
      for ((tag, dir) <- Seq("1x" -> base, s"${mult}x" -> zout);
           (form, run) <- Seq(
             "capped" -> (() =>
               graft.operators.Similarity.hybridRrfLexCapped(spark, dir)),
             "uncapped" -> (() =>
               graft.operators.Similarity.hybridRrfLexUncapped(spark, dir)))) {
        val (secs, rows) = time(iters)(run())
        val line = s"""{"query":"hybrid_lex_$form","scale":"$tag",""" +
          s""""sec":${f3(secs)},"rows":$rows}"""
        println(line)
        report += line
      }
    }

    // Posting-shaped text family under Zipf-honest scaling (opt-in via
    // "zipf_text", VERDICT r13 missing #5): tf-idf, RAKE, incremental BPE
    // and BM25 are only ever measured under vocabulary sharding (df held
    // constant by construction); the verbatim-replication corpus is the
    // complement — every term's df grows ×mult, the head-term growth a
    // real corpus delivers. Similarity-shaped queries must NOT ride this
    // corpus (they would densify quadratically); these four are posting/
    // aggregate shaped, so the honest question is whether any of their
    // plans hides a df-superlinear term.
    if (onlyQs.exists(_.contains("zipf_text"))) {
      val zout = s"tmp/zipf$mult"
      buildZipfCorpus(spark, base, zout, mult)
      for (q <- Seq("text_tfidf_terms", "text_rake_phrases",
             "text_bpe_train_incremental", "text_bm25_topk");
           (tag, dir) <- Seq("1x" -> base, s"${mult}x" -> zout)) {
        val (secs, rows) = time(iters)(SparkEntry.queries(q)(spark, dir))
        val line = s"""{"query":"$q","scale":"$tag",""" +
          s""""sec":${f3(secs)},"rows":$rows}"""
        println(line)
        report += line
      }
    }

    // Quality/eval scale probes (opt-in via "dq_eval", VERDICT r12 item
    // 8): dq_constraints (13-check single-pass audit over lineitem-shaped
    // data — here the scaled documents table stands in) and eval_pr_curve
    // (corpus pass -> <=1001-row histogram -> bounded fold) at 1x and
    // x mult, confirming the single-pass / bounded-fold claims.
    if (onlyQs.exists(_.contains("dq_eval"))) {
      val relOut = s"tmp/sfrel$mult"
      buildRelCorpus(spark, base, relOut, mult)
      // dq_constraints reads the relational tables (keyspace-offset
      // corpus); eval_pr_curve reads documents (vocabulary-sharded corpus)
      for ((q, sDir) <- Seq("dq_constraints" -> relOut,
             "eval_pr_curve" -> out);
           (tag, dir) <- Seq("1x" -> base, s"${mult}x" -> sDir)) {
        val (secs, rows) = time(iters)(SparkEntry.queries(q)(spark, dir))
        val line = s"""{"query":"$q","scale":"$tag",""" +
          s""""sec":${f3(secs)},"rows":$rows}"""
        println(line)
        report += line
      }
    }

    // Round-13 session-3 operator probes (opt-in via "s3_ops"). The
    // relational trio rides the keyspace-offset corpus, which holds the
    // PART CATALOG fixed while orders multiply — exactly how a real
    // basket corpus grows (same products, more transactions), so pair
    // supports grow with the data instead of the vocabulary:
    //  - rec_market_basket: basket-keyed self-join, volume ×mult;
    //  - stat_theil_sen: the (seg × month) fold shrinks a ×mult corpus
    //    to the SAME bounded frame — wall should be the fold scan term;
    //  - sketch_cms_join_card: one mergeable scan, 16k cells of state;
    //  - emb_pca_power (vocabulary-sharded embeddings): one Gram-fold
    //    scan + 8 bounded rounds — wall = scan term + fixed round
    //    latency;
    //  - ev_acf (inline-scaled events, same calendar ×mult rows): the
    //    daily fold shrinks everything to ≤31 rows.
    if (onlyQs.exists(_.contains("s3_ops"))) {
      val relOut = s"tmp/sfrel$mult"
      buildRelCorpus(spark, base, relOut, mult)
      val evOut = s"tmp/sfev$mult"
      buildEventsCorpus(spark, base, evOut, mult)
      for ((q, sDir) <- Seq("rec_market_basket" -> relOut,
             "stat_theil_sen" -> relOut,
             "sketch_cms_join_card" -> relOut,
             "emb_pca_power" -> out,
             "ev_acf" -> evOut);
           (tag, dir) <- Seq("1x" -> base, s"${mult}x" -> sDir)) {
        val (secs, rows) = time(iters)(SparkEntry.queries(q)(spark, dir))
        val line = s"""{"query":"$q","scale":"$tag",""" +
          s""""sec":${f3(secs)},"rows":$rows}"""
        println(line)
        report += line
      }
    }

    // Round-13 session-4 operator probes (opt-in via "s4_ops"):
    //  - dedup_prefix_pairs (vocab-sharded docs): prefix df is
    //    shard-constant, so candidate volume Σ C(prefix-df, 2) scales
    //    ×mult — wall should track the shingling scan, the AllPairs
    //    completeness claim at scale;
    //  - sim_dbscan (sharded embeddings): the ε-graph grid join is the
    //    quadratic term (intra-shard pairs only by the ±1 diagonal
    //    construction); degree/core/border stages are keyed aggs on the
    //    ×mult edge frame;
    //  - mm_audio_fingerprint (sharded docs): decode scan + an agg on a
    //    key space bounded at 2^16 — must read near-flat per row;
    //  - ev_top_paths (inline-scaled events): one user-keyed window pass
    //    folding to ≤|event-types|³ rows;
    //  - sketch_bloom_join / stat_welch_t / layout_zorder (keyspace-offset
    //    relational corpus — bloom keys, cohorts, and the partkey catalog
    //    all scale honestly): one-scan funnels over fixed sketch/zone-map
    //    state (64 bloom words, 64 files, 6 sums).
    if (onlyQs.exists(_.contains("s4_ops"))) {
      val relOut = s"tmp/sfrel$mult"
      buildRelCorpus(spark, base, relOut, mult)
      val evOut = s"tmp/sfev$mult"
      buildEventsCorpus(spark, base, evOut, mult)
      for ((q, sDir) <- Seq(
             "mm_audio_fingerprint" -> out,
             "ev_top_paths" -> evOut,
             // batch 2: windowed funnel + Markov classes (user-keyed
             // window passes to bounded folds), the inference trio
             // (one-scan folds), Neyman (strata fold + one lang window),
             // rec coverage (basket pair join + catalog-bounded Gini),
             // the AllPairs recall audit (both pair paths + anti-join),
             // and the truss peel (5 pinned wedge-close rounds)
             "ev_window_funnel" -> evOut,
             "ev_markov_classes" -> evOut,
             "stat_welch_t" -> relOut,
             "stat_anova" -> relOut,
             "stat_spearman" -> relOut,
             "sample_neyman" -> out,
             "rec_coverage" -> relOut,
             "sketch_bloom_join" -> relOut,
             "layout_zorder" -> relOut,
             // r15: HITS (per-half-round edge join, work ∝ |E| — the
             // keyspace-offset corpus multiplies edges honestly) and
             // Brown-Forsythe (rank window + one moment fold)
             "graph_hits" -> relOut,
             "stat_levene" -> relOut,
             // r16: macro-F1 (one langPreds corpus pass + <=|langs|²-row
             // arithmetic — the measured langid family shape), DiD (2x2
             // cell agg folded to one row over the events corpus), the
             // fixed-grid quantile sketch (one map-side-combinable
             // histogram agg over lineitem — must read at the scan
             // floor), and component sizes (starContraction under ×mult
             // pair volume; vocabulary sharding replicates components
             // without merging them, so rounds stay constant and the
             // slope isolates the per-round contraction cost)
             "eval_macro_f1" -> out,
             "ev_did" -> evOut,
             "sketch_quantile" -> relOut,
             "graph_component_sizes" -> out,
             // r16 wave 2: Mann-Whitney (one join + (seg,value)-keyed
             // count + segment-partitioned cumsum — orders×customer
             // scale honestly on the keyspace-offset corpus), ROUGE
             // (pair-local gram counts + clipped co-keyed join), CUPED
             // (one user-keyed fold to five moments)
             "stat_mann_whitney" -> relOut,
             "eval_rouge_n" -> out,
             "ev_cuped" -> evOut,
             // r16 wave 3: BT (one corpus pass then bounded-game-frame
             // iteration — cost independent of corpus), permutation test
             // (fold-first: |users|*K explode, never events*K)
             "eval_bradley_terry" -> out,
             "stat_perm_test" -> evOut,
             "dedup_prefix_pairs" -> out,
             "dedup_recall_audit" -> out,
             // r14: the hash-stratum sampled audit — must read near the
             // corpus-scan floor where the exact audit reads ~26 s
             "dedup_recall_audit_sampled" -> out,
             "graph_truss" -> out,
             "sim_dbscan" -> out)
           // names passed alongside the block tag restrict it (the ×100
           // decade only pays for the probes it is asked about)
           if onlyQs.forall(set => set.size <= 1 || set.contains(q));
           (tag, dir) <- Seq("1x" -> base, s"${mult}x" -> sDir)) {
        // partition-count sizing, the harness-side knob a cluster sizes by
        // data volume: 32 partitions at ×100 put 32 CONCURRENT ~150 MB
        // window-sort buffers on the 4.6 GiB heap (measured: the AllPairs
        // per-doc rank OOMs); partitions ∝ corpus keeps each task's
        // working set constant while AQE re-coalesces the small stages
        val parts =
          if (tag == "1x") cpus.toInt else cpus.toInt * math.max(1, mult / 10)
        spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
        // finally-restore (ADVICE r13): a throwing probe must not leak the
        // ×100 partition count into every later probe block of the run
        val (secs, rows) =
          try time(iters)(SparkEntry.queries(q)(spark, dir))
          finally spark.conf.set("spark.sql.shuffle.partitions", cpus)
        val line = s"""{"query":"$q","scale":"$tag",""" +
          s""""sec":${f3(secs)},"rows":$rows}"""
        println(line)
        report += line
      }
    }

    // IVF-bucketed DBSCAN (opt-in via "dbscan_ivf", r14): the production
    // swap's slope, with nCells scaled as the operator's own doctrine
    // prescribes (8·√mult — compare term 4n²/k and assignment term n·k
    // balance at k ∝ √n). The FIRST cut (fixed 8 cells + a materialized
    // candidate distinct) measured 241.7 s at ×10 where the grid join
    // read 29.0 s — both fixes (inline verify, scaled cells) came from
    // that number.
    if (onlyQs.exists(_.contains("dbscan_ivf"))) {
      for ((tag, dir, k) <- Seq(
             ("1x", base, 8),
             (s"${mult}x", out, (8 * math.sqrt(mult)).round.toInt))) {
        // partitions ∝ corpus (the s4_ops sizing law): at ×100 the
        // co-membership join streams ~10⁸ candidate rows carrying two
        // 64-long arrays each — 32 concurrent task buffers OOM'd the
        // heap (measured r15); per-task working set must stay constant
        val parts =
          if (tag == "1x") cpus.toInt else cpus.toInt * math.max(1, mult / 10)
        spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
        val (secs, rows) =
          try time(iters)(
            graft.operators.Similarity.dbscanIvfClusters(spark, dir, k))
          finally spark.conf.set("spark.sql.shuffle.partitions", cpus)
        val line = s"""{"query":"sim_dbscan_ivf","scale":"$tag",""" +
          s""""sec":${f3(secs)},"rows":$rows,"ncells":$k}"""
        println(line)
        report += line
      }
    }

    // r15 Zipf decades (opt-in via "zipf_r15", VERDICT r14 #3/#8): the
    // df-sensitive newcomers under verbatim replication, where every
    // term's df grows ×mult — TextRank (co-occurrence pair supports grow
    // with df, the exact blind spot the corpus exists for), sparse LSA
    // (triples ∝ df; the rescale divisors don't grow), winnowing (the
    // fingerprint join is df-pruned — does the prune hold at ×mult df?).
    if (onlyQs.exists(_.contains("zipf_r15"))) {
      val zout = s"tmp/zipf$mult"
      buildZipfCorpus(spark, base, zout, mult)
      for (q <- Seq("text_textrank_terms", "text_lsa_power",
             "text_winnowing");
           (tag, dir) <- Seq("1x" -> base, s"${mult}x" -> zout)) {
        val (secs, rows) = time(iters)(SparkEntry.queries(q)(spark, dir))
        val line = s"""{"query":"$q","scale":"$tag",""" +
          s""""sec":${f3(secs)},"rows":$rows}"""
        println(line)
        report += line
      }
    }

    // Sampled-audit S ∝ corpus (opt-in via "audit_scaled_s", VERDICT r14
    // #4): the scaladoc claims the pair term is CONSTANT when the stratum
    // count scales with the corpus (S = 8·mult keeps expected sampled
    // pairs fixed); this block measures it instead of asserting it. The
    // corpus-linear shingling/df-rank scan term remains by design — the
    // honest comparison is against the FIXED-S point, which pays the same
    // scan but a ×mult pair term.
    if (onlyQs.exists(_.contains("audit_scaled_s"))) {
      for ((tag, dir, strata) <- Seq(
             ("1x", base, 8),
             (s"${mult}x-fixedS", out, 8),
             (s"${mult}x-scaledS", out, 8 * mult))) {
        val (secs, rows) = time(iters)(
          graft.operators.TextOps.recallAuditSampled(spark, dir, strata))
        val line = s"""{"query":"dedup_recall_audit_sampled","scale":"$tag",""" +
          s""""sec":${f3(secs)},"rows":$rows,"strata":$strata}"""
        println(line)
        report += line
      }
    }

    // ExactSubstr grain sensitivity (opt-in via "dup_grain", VERDICT r12
    // item 7): span/coverage counts and wall at n = 8 (the gate grain),
    // 16, 32 on the 1x corpus — how much duplicated mass each doubling
    // of the grain gives up (wider grains only ever shrink coverage).
    if (onlyQs.exists(_.contains("dup_grain"))) {
      for (n <- Seq(8, 16, 32)) {
        val (secs, rows) = time(iters)(
          graft.operators.TextOps.dupSpanStatsAt(spark, base, n))
        val agg = graft.operators.TextOps.dupSpanStatsAt(spark, base, n)
          .agg(coalesce(sum(col("n_spans")), lit(0L)).as("spans"),
            coalesce(sum(col("dup_words")), lit(0L)).as("dup_words"))
          .head()
        val line = s"""{"query":"dup_grain","scale":"1x,n=$n",""" +
          s""""sec":${f3(secs)},"rows":$rows,"spans":${agg.getLong(0)},""" +
          s""""dup_words":${agg.getLong(1)}}"""
        println(line)
        report += line
      }
    }

    // Wedge-cap payoff decade (opt-in via "wedge_decade", VERDICT r12
    // item 5): the corpus-derived graph at x100 only reaches wedge
    // volume/m = 28.7 (cap32 saves 72% of volume but ~11% of wall — the
    // close is not yet wedge-bound there). This block synthesizes a
    // DETERMINISTIC preferential-attachment-style graph (both endpoints
    // Zipf(1) via inverse-CDF n^u of a hash-uniform, the degree law key
    // reuse produces) whose ORIENTED volume/m grows like sqrt(m), and
    // times exact vs cap=32 on the same edge frame at 1x and x mult —
    // the regime where the -72% volume must become a wall win.
    if (onlyQs.exists(_.contains("wedge_decade"))) {
      import graft.Pin.PinOps
      def heavyEdges(mTarget: Long): org.apache.spark.sql.DataFrame = {
        // denser than the corpus graph (avg degree ~96 vs ~2): with both
        // endpoints Zipf(1) this pushes oriented volume/m past 100 at the
        // x100 point — the regime the round-12 corpus scale-up never
        // reached (28.7 there)
        val n = math.max(1000L, mTarget / 48L)
        // oversample x3: self-loops and duplicate pairs are filtered
        spark.range(mTarget * 3)
          .select(
            floor(pow(lit(n.toDouble),
              (col("id") * 2654435761L % 1000000007L).cast("double") / 1e9))
              .cast("long").as("x"),
            floor(pow(lit(n.toDouble),
              (col("id") * 40503L % 999999937L).cast("double") / 1e9))
              .cast("long").as("y"))
          .filter(col("x") =!= col("y"))
          .select(least(col("x"), col("y")).as("a"),
            greatest(col("x"), col("y")).as("b"))
          .distinct()
          .repartition(32)
          .pin(true)
      }
      for ((tag, mT) <- Seq("1x" -> 12000L, s"${mult}x" -> 12000L * mult)) {
        val edges = heavyEdges(mT)
        // oriented wedge stats: is this point in the volume/m >= 100 regime?
        val deg = edges.select(col("a").as("v"))
          .unionByName(edges.select(col("b").as("v")))
          .groupBy("v").agg(count(lit(1)).as("d"))
        val od = edges
          .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
          .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
          .select(when(col("da") < col("db")
              || (col("da") === col("db") && col("a") < col("b")), col("a"))
            .otherwise(col("b")).as("src"))
          .groupBy("src").agg(count(lit(1)).as("od"))
        val st = od.agg(sum(col("od")).as("m"), max(col("od")).as("max_od"),
            sum((col("od") * (col("od") - 1) / 2).cast("long")).as("volume"),
            sum((least(col("od"), lit(32L))
              * (least(col("od"), lit(32L)) - 1) / 2).cast("long"))
              .as("volume_cap32"))
          .head()
        for ((form, run) <- Seq(
            "exact" -> (() => graft.operators.TextOps.ccExactOnEdges(edges)),
            "cap32" -> (() => graft.operators.TextOps.ccCappedOnEdges(edges, 32)))) {
          val (secs, rows) = time(iters)(run())
          val line = s"""{"query":"wedge_decade_$form","scale":"$tag",""" +
            s""""sec":${f3(secs)},"rows":$rows,"m":${st.getLong(0)},""" +
            s""""max_od":${st.getLong(1)},"volume":${st.getAs[Any](2)},""" +
            s""""volume_cap32":${st.getAs[Any](3)}}"""
          println(line)
          report += line
        }
      }
    }

    // Degree-capped wedge close (opt-in via "graph_clustering_capped"):
    // the Σod² mitigation for the one measured corpus-volume term in the
    // graph battery, timed against the exact close in the same window
    // (pass "graph_clustering_coeff,graph_clustering_capped").
    if (onlyQs.exists(_.contains("graph_clustering_capped")))
      for ((tag, dir) <- Seq("1x" -> base, s"${mult}x" -> out);
           cap <- Seq(32, 128)) {
        val (secs, rows) = time(iters)(
          graft.operators.TextOps.clusteringCoeffCapped(spark, dir, cap))
        val line = s"""{"query":"graph_clustering_capped","scale":"$tag",""" +
          s""""cap":$cap,"sec":${f3(secs)},"rows":$rows}"""
        println(line)
        report += line
      }

    for (q <- corpusQs; (tag, dir) <- Seq("1x" -> base, s"${mult}x" -> out)) {
      val (secs, rows) = time(iters)(SparkEntry.queries(q)(spark, dir))
      val line = s"""{"query":"$q","scale":"$tag","sec":${f3(secs)},"rows":$rows}"""
      println(line)
      report += line
    }

    // SemDeDup with the cell count sized to the corpus (nCells ≈ √N —
    // the deployment configuration the operator's scaladoc prescribes):
    // per-cell compare volume then stays ~N, and the slope should read
    // near-linear. Running the 10× point at the 1× cell count would
    // measure the wrong configuration (×mult vectors per cell → ×mult²
    // compares) by construction.
    if (onlyQs.forall(_.contains("dedup_semantic")))
      for ((tag, dir, cells) <- Seq(
          // nCells tracks ≈0.63·√N at every scale (45 at N=5000), so each
          // point measures the deployment configuration, not a denser one;
          // ×10 keeps its historical 140 (the formula's 142 rounds there)
          ("1x", base, 45),
          (s"${mult}x", out,
            if (mult == 10) 140 else (45 * math.sqrt(mult)).round.toInt))) {
        val (secs, rows) = time(iters)(
          graft.operators.Similarity.semanticDedup(spark, dir, cells))
        val line = s"""{"query":"dedup_semantic","scale":"$tag",""" +
          s""""sec":${f3(secs)},"rows":$rows,"n_cells":$cells}"""
        println(line)
        report += line
      }

    // k-NN graph in its deployment configuration: hyperplane count grows
    // with N (planes = 8 + log₂mult, i.e. bucket count tracks data) so
    // per-bucket compare volume — Σ bucket² — stays linear in N; running
    // 100× at the 1× 8-plane geometry would self-join ~2000-row buckets
    // (×mult² compares), a misconfiguration like the fixed-cell SemDeDup
    if (onlyQs.forall(_.contains("sim_knn_graph")))
      for ((tag, dir, planes) <- Seq(
          ("1x", base, 8),
          (s"${mult}x", out,
            8 + (math.log(mult) / math.log(2)).ceil.toInt))) {
        val (secs, rows) = time(iters)(
          graft.operators.Similarity.knnGraph(spark, dir, planes))
        val line = s"""{"query":"sim_knn_graph","scale":"$tag",""" +
          s""""sec":${f3(secs)},"rows":$rows,"n_planes":$planes}"""
        println(line)
        report += line
      }

    // PQ geometry sweep (1× corpus): probe time and serving-state size vs
    // M at fixed k=8 (nbits=3). bytes/vector = M·nbits/8 is the index the
    // cluster actually holds; the probe is the flat ADC top-3 over all
    // corpus codes, so its time exposes the M-term LUT-sum cost directly.
    if (onlyQs.exists(_.contains("pq_geometry")))
      for (m <- Seq(2, 4, 8)) {
        val (secs, rows) = time(iters)(
          graft.operators.Similarity.pqAdcTop3(spark, base, m, 8))
        val bytesPerVec = f3(m * 3 / 8.0)
        val line = s"""{"query":"pq_geometry","scale":"M=$m,k=8",""" +
          s""""sec":${f3(secs)},"rows":$rows,"bytes_per_vec":$bytesPerVec}"""
        println(line)
        report += line
      }

    // BPE rounds slope: the per-round corpus `replace` makes training
    // O(rounds·corpus); measure the rounds axis at 1× and the corpus axis
    // at rounds=3 over the scaled corpus, so both factors of the product
    // are on record. (The cluster-scale alternative — pair-cache
    // incremental merging à la the original BPE implementation — trades
    // the full corpus pass for touching only documents containing the
    // winning pair; documented in PLANS.md.)
    if (onlyQs.exists(_.contains("bpe_rounds"))) {
      for (r <- Seq(3, 8, 16)) {
        val (secs, rows) = time(iters)(
          graft.operators.TextOps.bpeTrain(spark, base, r))
        val line = s"""{"query":"bpe_rounds","scale":"1x,rounds=$r",""" +
          s""""sec":${f3(secs)},"rows":$rows}"""
        println(line)
        report += line
      }
      val (secs, rows) = time(iters)(
        graft.operators.TextOps.bpeTrain(spark, out, 3))
      val line = s"""{"query":"bpe_rounds","scale":"${mult}x,rounds=3",""" +
        s""""sec":${f3(secs)},"rows":$rows}"""
      println(line)
      report += line
    }
    println("SCALING_DONE " + report.size)
    spark.stop()
  }
}
