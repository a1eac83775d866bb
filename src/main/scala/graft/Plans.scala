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
      |## Scaling slope: sf0.1 vs a 10× corpus (measured, round 7)
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
      |held). Measurement protocol, learned the hard way: small-output points
      |run FIRST — the two big pair emitters leave the shared JVM under memory
      |pressure (TaskMemoryManager GB-page retries) that was measured to inflate
      |a code-identical query run right after them by 5×.
      |
      |These numbers follow the round-7 plan-reuse fixes (signature frames
      |materialized once instead of re-computed per self-join branch).
      |
      || query | 1× sec | 1× rows | 10× sec | 10× rows | time slope | note |
      ||---|---|---|---|---|---|---|
      || dedup_jaccard_pairs | 3.59 | 190,925 | 6.37 | 1,909,250 | **×1.8 for ×10 rows** | deletion-neighborhood join |
      || dedup_clusters | 3.43 | 5,000 | 5.66 | 50,000 | ×1.7 | star contraction: rounds grow O(log n), not O(n) |
      || sim_ivf_topk | 2.12 | 30 | 3.35 | 30 | ×1.6 | k-means fit + assign is the linear part; probe constant |
      || aria_reference_scenario | 3.83 | 7 | 10.0 | 10 | ×2.6 | ×10 keys/txns and MORE epochs (10 vs 7 history rows) |
      || dedup_simhash_pairs | 2.15 | 1.26M | 257.4 | 297.8M | ×0.5 per output row | see below |
      || dedup_minhash_pairs | 2.65 | 4.95M | 648.4 | 499.6M | ×2.4 per output row | see below |
      |
      |The two LSH pair-emitters are the honest case: their cost is Θ(output
      |pairs), and on THIS corpus the 10× blow-up densifies their small hash
      |spaces (4-minhash band signatures over a ~30-word base vocabulary; 16-bit
      |simhash), so cross-shard bucket collisions inflate the emitted-pair count
      |×236/×101 — far beyond the ×10 true-duplicate growth. Per EMITTED PAIR,
      |simhash gets FASTER (0.59M → 1.16M pairs/s); minhash drops from 1.87M to
      |0.77M pairs/s because half a billion output rows through one 32-thread
      |JVM spill the pair-dedup hash tables (the visible GB-page retries) — on a
      |multi-executor cluster that distinct is spread across machines, which is
      |exactly what the banded equi-join plan parallelizes. At 100 TB with a
      |realistic vocabulary (simhash widened to 64 bits, more bands), bucket
      |density — and therefore output volume — is controlled by sketch width,
      |not by the join plan; the plans themselves carry no super-linear term in
      |INPUT size.
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
