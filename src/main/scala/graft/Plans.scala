package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Writes PLANS.md: the formatted physical plans of the headline queries,
  * as auditable evidence of the scale-design claims (broadcast vs shuffle
  * joins, parquet pushdown, partial aggregation, the two-phase GroupedTopK,
  * the grid-blocked near-dup equi-join). Regenerate with:
  *   sbt "runMain graft.Plans [sfDir] [outFile]"
  */
object Plans {

  /** Queries whose plan shape carries a specific scale claim. */
  private val headline = Seq(
    "q2_filter_project" -> "filters + projection pushed to the parquet scan",
    "q3_revenue_by_nation" -> "multi-way join: broadcast dims, shuffle fact, partial aggs",
    "q6_broadcast_join" -> "explicit broadcast of the small side",
    "q26_grouped_topk" -> "custom GroupedTopK: map-side partial before the exchange",
    "sim_neardup_pairs" -> "exact all-pairs as a grid-blocked equi-join (no nested loop)",
    "sim_ivf_topk" -> ("IVF cell-probe ANN over k-means centroids (the " +
      "BroadcastNestedLoopJoins here are the intentional cross joins against " +
      "the broadcast 8-row centroid table: every vector scores a CONSTANT " +
      "number of centroids — bounded at any data scale)"),
    "dedup_minhash_pairs" -> "LSH candidate pairs: bucketed (band, signature) self-join",
    "sketch_kmv_agg" -> "KMV via one typed-imperative aggregation (no distinct/join)",
    "skew_salted_agg" -> "salted two-stage aggregation",
    "ev_sessions" -> "native session_window merge, one shuffle",
    "q34_order_priority" -> ("EXISTS as a hash semi-join: date filter pushed " +
      "to the orders scan, 2-column lineitem read, range predicate " +
      "evaluated post-probe — no nested loop"),
    "text_ngram_topk" -> ("trigram generation is a per-row Generate (no " +
      "shuffle); one agg exchange on (lang, gram); bounded-heap GroupedTopK " +
      "partial before the per-lang exchange"),
    "dedup_simhash_pairs" -> ("Hamming<=1 pairs from (band, byte) bucket " +
      "equi-joins — pigeonhole banding, never all-pairs; the bit_count " +
      "filter rides inside the join"),
    "text_decontaminate" -> ("eval split shingled separately and broadcast; " +
      "the training side pays only its own shingle window + one broadcast " +
      "probe — no big-side shuffle beyond the per-doc aggregate"),
    "q37_nested_semi" -> ("TPC-H Q20 shape: part filter broadcast into " +
      "lineitem, one per-(supplier,part) agg shuffle, LEFT SEMI probe by " +
      "the tiny supplier table, nation broadcast"),
    "sketch_bloom_filter" -> ("bloom build is one groupBy(nation) of " +
      "bit_or partials; the probe side cross-joins a broadcast of the 25 " +
      "finished 24-byte blooms — no probe-side shuffle, the " +
      "bloom-prefiltered-semi-join shape"),
    "ev_attribution" -> ("point-in-time interval self-join shuffled once " +
      "on user_id; the latest-view rn=1 filter is rewritten to the " +
      "bounded-heap GroupedTopK by the injected optimizer rule — no " +
      "per-click candidate sort"),
    "sketch_hll_distinct" -> ("HyperLogLog: ONE map-side-combinable " +
      "aggregation over the scan (64 max-merged registers per group); the " +
      "register fill and exact-count sides broadcast"),
    "q39_argmin_supplier" -> ("correlated-minimum argmin folded into ONE " +
      "shuffle via lexicographic min(struct(price, suppkey)) — no " +
      "aggregate-then-join-back second pass over the fact table"),
    "sim_semantic_clusters" -> ("star-contraction components over the " +
      "grid-blocked exact pair join; the pair frame feeds the contraction " +
      "unsorted (no wasted global exchange) and each round is two " +
      "bounded shuffles"),
    "q40_latest_per_key" -> ("CDC-compaction read (latest record per key): " +
      "the rn=1 window idiom is rewritten to the bounded-heap GroupedTopK " +
      "— one partial-then-final exchange, no Window, no per-key sort"))

  /** Measured scaling evidence, maintained by hand from ScalingBench runs
    * (see its scaladoc) and appended after the plans so regeneration
    * doesn't lose it.
    */
  private val scalingSection: String =
    """
      |## Scaling slope: sf0.1 vs a 10× corpus (measured, round 9 — post
      |## first-matching-band, distinct-free LSH emitters, shared live-ops Aria)
      |
      |Harness: `sbt "runMain graft.ScalingBench"` (min-of-2 per point, local[32]).
      |The 10× corpus gives each of 10 shards a disjoint token vocabulary (a
      |bijective remap of the sf0.1 corpus per shard — EVERY shard remapped, with
      |equal-length digit-terminated suffixes, so cross-shard token equality is
      |impossible by construction), so each shard reproduces the original corpus's
      |intra-shard similarity structure exactly and true cross-shard similarity
      |is zero — rows and true pair volume both scale by exactly 10. Embeddings
      |replicate with offset ids (the query set is pinned to vec_id < 10, so
      |probe count stays constant while data grows). The Aria point scales the
      |generated workload itself (keys, txns, keyspace ×10, conflict density
      |held). Measurement protocol: small-output points run FIRST — the big pair
      |emitters leave the shared JVM under memory pressure measured to inflate a
      |code-identical query run right after them by 5×.
      |
      |Round 7 measured ×101/×236 emitted-pair blow-ups on the two LSH emitters
      |and attributed them to narrow sketches. Round 8 found and fixed the two
      |REAL root causes, both in the sketch INPUT, not the join plans:
      |
      |1. **Token-code prefix collapse** — token codes packed only the first 3
      |   chars + length, so the suffix-remapped shards collapsed back into ONE
      |   vocabulary at the code level and every sketch saw 10 copies of each
      |   doc: candidate volume went ~quadratic (mult²) by construction.
      |   Appending the last char as one more base-256 digit (exactness bound
      |   < 2^51 preserved) restored true shard disjointness: minhash pairs
      |   dropped ×100.9 → ×11.1 for ×10 docs with NO band/width change.
      |2. **Affine hash bit-correlation** — even at 62 bits, simhash pairs
      |   stayed ~quadratic because codes differing by a small constant (the
      |   shard digit) get affine hashes with correlated high bits, pulling
      |   disjoint shards within Hamming 3. Avalanching the token hashes (the
      |   HLL xorshift construction) fixed it: ×99.6 → ×14.5 for ×10 docs.
      |
      || query | 1× sec | 1× rows | 10× sec | 10× rows | slope | note |
      ||---|---|---|---|---|---|---|
      || dedup_jaccard_pairs | 3.50 | 190,925 | 2.95 | 1,909,250 | **≤×1 for ×10 rows** | deletion-neighborhood join |
      || dedup_clusters | 2.13 | 5,000 | 2.88 | 50,000 | ×1.35 | star contraction: rounds O(log n) |
      || sim_ivf_topk | 1.56 | 30 | 2.06 | 30 | ×1.3 | fit+assign linear; probe constant |
      || aria_reference_scenario | 4.40 | 7 | 6.40 | 10 | ×1.45 | ×10 keys/txns and MORE epochs; r9 shared live-ops |
      || scan_pruned_zorder | 0.12 | 1 | 0.15 | 1 | ~flat | see below (incl. a 100× point) |
      || dedup_simhash_wide_pairs | 3.04 | 162,673 | 6.62 | 2,358,264 | ×2.2 for ×14.5 pairs | 62-bit avalanched, Hamming ≤ 3, 4 bands |
      || dedup_minhash_pairs | 0.67 | 4.36M | 11.7 | 48.2M | ×17.4 for ×11.1 pairs | distinct-free; cost IS the 48M-row emission |
      || dedup_simhash_pairs | 0.92 | 533,215 | 3.88 | 37.8M | ×4.2 for ×71 pairs | 16-bit DIAGNOSTIC saturation case |
      |
      |Round-9 re-measurement note: the round-8 table was taken BEFORE commit
      |2240b3a (first-matching-band emission) landed; this table describes the
      |shipped distinct-free emitters. The change is decisive at scale:
      |dedup_minhash_pairs' 10× point fell 75.4s → 11.7s (and 1× 4.07 → 0.67)
      |with identical output — the old cost was the 48M-row pair distinct's
      |hash table spilling in one JVM; with first-matching-band there is
      |nothing left to dedup, so the residual ×17.4-vs-×11.1 gap is just
      |emitting 48M counted rows through 32 threads. 16-bit simhash likewise
      |34.3s → 3.9s, confirming r8's "saturation, not plan" diagnosis —
      |it stays DIAGNOSTIC (SparkEntry.diagnostic): ×71 pairs for ×10 docs is
      |birthday-collision output, unusable beyond ~50k docs regardless of
      |speed. Output volume is ≈ linear in data for minhash (×11.1) and wide
      |simhash (×14.5 — the residual over ×10 is per-shard hash-realization
      |variance at the Hamming-3 boundary, since each remapped shard is an
      |independent hash draw of the same corpus).
      |
      |**100× points (round 9)** — one more decade for the cheapest-slope
      |queries (100 shards, same disjoint-vocabulary construction; the
      |after-last-'s' digit-run argument makes cross-shard token equality
      |impossible at ANY shard count, not just ≤10):
      |
      || query | 1× sec | 100× sec | slope | note |
      ||---|---|---|---|---|
      || dedup_jaccard_pairs | 4.54 | 52.8 | **×11.6 for ×100 rows** | 19.1M pairs emitted |
      || dedup_clusters | 2.93 | 19.2 | **×6.6 for ×100 rows** | 500k docs, rounds still O(log n) |
      |
      |Wall-clock grows an order of magnitude SLOWER than data across two
      |decades on a fixed 32-thread box — the per-row cost falls as fixed
      |job overhead amortizes, which is the signature of a plan whose work is
      |all in data-parallel stages (on a 1000-executor cluster the same plans
      |spread by partition count).
      |
      |**scan_pruned_zorder** (zone maps + z-order): a z-ordered, zone-mapped
      |VersionedTable (both dims min/max-normalized to a shared 10-bit range
      |before interleaving) built at 8 files (1×), 80 files (10×), 800 files
      |(100×), point-probed on doc_id and range-probed on n_chars:
      |
      || scale | files | doc_id probe opens | n_chars probe opens | probe sec |
      ||---|---|---|---|---|
      || 1× | 8 | 5 (62%) | 3 (38%) | 0.12 |
      || 10× | 80 | 18 (22%) | 14 (18%) | 0.15 |
      || 100× | 800 | 42 (5.3%) | 65 (8.1%) | 0.30 |
      |
      |Both dimensions prune (a linear sort prunes only its leading column —
      |LayoutSpec proves the contrast), and the opened FRACTION falls
      |62% → 22% → 5.3% across two decades — the 2-D z-curve's O(√F) law
      |measured, not argued: opens grow ~×8.4 while files grow ×100 (√100 =
      |10). When O(1) opens is required on a single dimension, the 1-D path
      |already provides it: compact(sortBy) range-clusters and a point probe
      |opens exactly 1 file of 4+ (VersionedTableSpec "sorted compaction
      |tightens zone maps").
      |""".stripMargin

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val out = if (args.length > 1) args(1) else "PLANS.md"
    val spark = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    sb ++= "# PLANS — formatted physical plans of the headline queries\n\n"
    sb ++= s"Generated by `graft.Plans` at `$sfDir` (plan SHAPE is what matters;\n"
    sb ++= "AQE may re-plan exchanges at runtime). Regenerate: " +
      "`sbt \"runMain graft.Plans\"`.\n"
    headline.foreach { case (name, claim) =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      sb ++= s"\n## $name — $claim\n\n```\n"
      sb ++= df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb ++= "```\n"
    }
    sb ++= scalingSection
    Files.write(Paths.get(out), sb.toString.getBytes(StandardCharsets.UTF_8))
    println(s"PLANS_WRITTEN=$out")
    spark.stop()
  }
}
