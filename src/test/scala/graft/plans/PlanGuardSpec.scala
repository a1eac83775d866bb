package graft.plans

import graft.{SparkEntry, SparkSpec}

/** Plan-quality regression guard over the ENTIRE query surface: no query
  * may plan a BroadcastNestedLoopJoin or CartesianProduct unless it is on
  * the explicit whitelist of documented intentional cross joins (each one
  * joins against a broadcast CONSTANT-sized side, so its cost is linear in
  * the big side at any scale). A new query that accidentally degrades to
  * an all-pairs join fails here before it ever reaches a benchmark.
  */
class PlanGuardSpec extends SparkSpec {

  /** Queries whose plans legitimately contain a broadcast nested loop —
    * every one is a cross join against a bounded broadcast side:
    * the 8-row k-means centroid table (ivf), the fixed query-vector set
    * (cosine/lsh/neardup probes), or single-row aggregate frames
    * (kv_scan_count's count×capacity join, the reference scenario's
    * three-aggregate summary row).
    */
  /** Max allowed cross-join operators per whitelisted query — counting,
    * not a blanket pass, so a whitelisted query that GAINS an accidental
    * second nested loop still fails. Values are the current audited plans.
    */
  private val intentionalCross = Map(
    "sim_ivf_assign" -> 1, // 8-row broadcast centroid table
    "sim_ivf_balance" -> 1, // same assignment pass, aggregated per cell
    "sim_ivf_topk" -> 2, // centroid table in assign + probe branches
    "sim_cosine_topk" -> 1, // fixed broadcast query-vector set
    "sim_knn_classify" -> 1, // fixed 100-vector broadcast eval set
    // fixed 10-vector broadcast query set (the ranked retrieval)
    "eval_ndcg" -> 1,
    "eval_rank_battery" -> 1, // same shared rankedTopOf probe broadcast
    // fixed broadcast probe set (vector channel) + the 1-row broadcast
    // ndocs frame feeding the lexical df-prune threshold (r13)
    "sim_hybrid_rrf" -> 2,
    "sim_lsh_recall" -> 2, // composes cosine_topk + lsh_topk, inherits theirs
    "kv_scan_count" -> 2, // single-row aggregate frames joined for summary
    // 40-row broadcast quarter calendar, interval-containment join
    "q25_range_join" -> 1,
    // 25-row broadcast bloom table probed by every customer
    "sketch_bloom_filter" -> 1,
    // 1-row broadcast corpus-total frame (the LM normalizer)
    "text_surprisal" -> 1,
    // 1-row broadcast normalizer frame (raw + smoothed-target totals)
    "text_dsir_weights" -> 1,
    // 1-row broadcast corpus-total frame (same LM as text_surprisal)
    "text_ppl_buckets" -> 1,
    // |langs|-row broadcast candidate set (the NB scoring expansion) +
    // the 1-row vocab frame crossed into the |langs|-row totals
    "text_lang_nb" -> 2,
    // exact-L2 baseline side: fixed 10-row broadcast query-vector set
    "sim_pq_recall" -> 1,
    // fixed 10-row broadcast query-vector set (exact MIPS baseline)
    "sim_mips_topk" -> 1,
    // full-width + prefix-width passes, each against the 10-row broadcast
    // query set
    "sim_matryoshka_recall" -> 2,
    // one per merge round: the 1-row winner frame × the 1-row post-merge
    // token-count frame building that round's report row (corpus-side
    // cross joins are materialized away by the per-round checkpoint)
    "text_bpe_train" -> 3,
    // 1-row broadcast corpus-stats frame (N, avgdl) + the 3-row broadcast
    // query-term frame scored against each doc's postings
    "text_bm25_topk" -> 1,
    // fixed 10-row broadcast query-vector set (label-mismatch probe)
    "sim_hard_negatives" -> 1,
    // 1-row broadcast corpus-total frame × the 1-row budget-threshold
    // frame (the kept-tokens-vs-budget comparison)
    "sample_token_budget" -> 2,
    // fixed 10-row broadcast query set scored on SQ8 codes
    "sim_sq_topk" -> 1,
    // SQ8 probe + the exact-cosine baseline, each against the 10-row
    // broadcast query set
    "sim_sq_recall" -> 2,
    // two 1-row broadcast total frames (token count, pair count) feeding
    // the lift normalizer
    "text_cooccur_lift" -> 2,
    // 1-row broadcast regression frame (the Zipf slope constants)
    "text_zipf_curve" -> 1,
    // fixed 5-row broadcast query-vector set (the candidate fetch)
    "sim_mmr_rerank" -> 1,
    // fixed 10-row broadcast probe set (radius search scan)
    "sim_range_search" -> 1,
    // 1-row broadcast corpus-totals frame (budget + source count)
    "sample_epoch_mix" -> 1,
    // three bounded 1-row summary frames composed into the card row
    // (+ the |langs|-row HHI's 1-row total)
    "text_corpus_profile" -> 3,
    // composes cosine_topk + lsh_topk, inherits their broadcast probes
    "sim_recall_curve" -> 2,
    // same nbScores subtree as text_lang_nb, inherits its two bounded
    // broadcast frames (|langs| candidates + the 1-row vocab)
    "text_langid_margin" -> 2,
    // 1-row broadcast trigram-total frame (the share normalizer)
    "ev_top_paths" -> 1,
    // the two bounded 1-row audit aggregates (found/missed) crossed into
    // the single report row
    "dedup_recall_audit" -> 2,
    // r17: the pre-rescale pin moved the HITS loop's 1-row max-divisor
    // rescale crosses OUT of the checkpointed frames — the final readout
    // now reads the lazily-rescaled a AND h (one bounded 1-row broadcast
    // cross each); same intentional shape, new residence
    "graph_hits" -> 2,
    // r17: same move — the final top-10 readout reads the lazily-rescaled
    // u (one 1-row max-divisor cross)
    "text_lsa_power" -> 1,
    // the 1-row broadcast (total nsig, total N) allocation normalizer —
    // twice: the alloc frame is rebuilt for the realized-sample join and
    // the final report (bounded |strata| frame, not worth a pin)
    "sample_neyman" -> 2,
    // the three bounded 1-row funnel aggregates (probe/pass/match) crossed
    // into the single output row; the bloom itself joins as a ≤64-row
    // broadcast EQUI join, not a nested loop
    "sketch_bloom_join" -> 3,
    // the 1-row broadcast max(partkey, suppkey) normalizer frame crossed
    // into the binning pass — once per zone-map layout + once for the
    // matched-rows fold (the scan is rebuilt per consumer; corpus-sized
    // frames are never pinned, the Affinity basket lesson)
    "layout_zorder" -> 3,
    // 1-row broadcast revenue-total frame under the 10-row decile window
    "ev_whale_curve" -> 1,
    // the two 1-row sweep-result frames composed into the probe row
    "graph_diameter_probe" -> 1,
    // 1-row broadcast effective-budget frame × the 1-row threshold frame
    // (same shape as sample_token_budget's whitelist entry)
    "sample_soft_budget" -> 2,
    // 1-row broadcast exact-count frame joined to the 3-row sweep
    "sketch_hll_sweep" -> 1,
    // 1-row broadcast revenue total (the Q11 HAVING scalar)
    "q52_supplier_value_share" -> 1,
    // 1-row broadcast positive-balance average (the Q22 scalar subquery)
    "q57_dormant_rich" -> 1,
    // 8-row broadcast centroid table crossed in the base-mass and
    // append-assignment branches (the sim_ivf_assign shape, twice)
    "sim_ivf_refresh" -> 2,
    // exact-cosine + SQ8-code scans, each against the 10-row broadcast
    // probe set
    "sim_sq_spearman" -> 2,
    // 8-row broadcast centroid table crossed in the assignment pass
    // (the sim_ivf_assign shape; the split itself is all cid-keyed)
    "sim_ivf_split" -> 1,
    // five 1-row broadcast cohort-totals frames (one per drifted column)
    // folded over the value histograms
    "dq_category_drift" -> 5,
    // three 1-row broadcast cohort-totals frames (one per numeric
    // column), same shape over the ≤64-bucket bitlength histograms
    "dq_numeric_drift" -> 3,
    // 1-row broadcast cell-total frame (N for the floored expectations)
    "dq_chi_square" -> 1,
    // two 1-row broadcast digit-total frames (one per audited column)
    "dq_benford" -> 2,
    // 1-row broadcast corpus-end frame (the censor clock)
    "ev_survival_table" -> 1,
    // 1-row broadcast total-mass frame (the share normalizer)
    "ev_markov_stationary" -> 1,
    // r16: the 1-row pooled-moment frame crossed into the 1-row arm frame
    "ev_cuped" -> 1,
    // r16: one 1-row max-divisor rescale cross per BT MM round
    "eval_bradley_terry" -> 3,
    // r16: the 1-row observed frame crossed into the 200-row permutation
    // fold, + the 1-row count crossed into the report row
    "stat_perm_test" -> 2,
    // the 1-row (n, Σx) normalizer crossed into the ≤|days| daily frame,
    // whose deviation subtree appears THREE times in the plan (lag side,
    // join side, denominator fold), + the 1-row denominator cross into
    // the 7-row lag frame (r13 session 3)
    "ev_acf" -> 4,
    // 1-row broadcast basket-total frame (the lift normalizer N)
    "rec_market_basket" -> 1,
    // 1-row broadcast exact-join-size frame joined to the 1-row estimate
    "sketch_cms_join_card" -> 1,
    // r14: the two bounded 1-row audit aggregates (found/missed) crossed
    // into the single report row — the dedup_recall_audit shape; r15
    // adds the jackknife's 1-row frames (jstat into the ≤8-row group
    // frame, dev and jack into the report row) = 5 in the final segment
    "dedup_recall_audit_sampled" -> 5,
    // r15: the 1-row (theta, k) frame crossed with the 1-row retained-
    // intersection count into the single report row
    "sketch_kmv_intersect" -> 1,
    // r16: the 1-row total-count frame + the 5-row quantile-target frame
    // crossed into the bounded cumulative-histogram readout
    "sketch_quantile" -> 2,
    // r14 ADVICE fix: the 1-row assert_true state-count guard (<=9
    // event types) crossed into the bounded class frame
    "ev_markov_classes" -> 1,
    // r14: 1-row total + 1-row chance-term frames into the report row
    "eval_cohens_kappa" -> 2,
    // r14: inherits one of text_lang_nb's bounded broadcast frames
    // (|langs| candidates) in the final un-pinned segment
    "eval_mcnemar" -> 1,
    // r14: the 1-row total-weight frame crossed into the cumsum scan
    "sample_pps" -> 1,
    // r14: the bounded k1xk2 margin grid cross + the 1-row total N
    "stat_chi2" -> 2,
    // r14: the 1-row tie-correction frame crossed into the k-group fold
    "stat_kruskal_wallis" -> 1,
    // r14: the k-row x k-row non-equi pair join (bounded |priorities|^2)
    // + the 1-row MSW frame
    "stat_tukey_pairs" -> 2)

  /** Queries whose plans legitimately contain a Window with EMPTY
    * partitionSpec — Spark executes such a window on a SINGLE task
    * (global sort into one reducer), so each entry must justify why its
    * windowed frame is BOUNDED (constant-or-configuration-sized, never
    * corpus/user/doc-dimension). Unbounded global orderings must use the
    * two-pass [[graft.operators.GlobalOrder]] primitive instead — the
    * round-10 verdict found three queries shipping the single-reducer
    * form, which this sweep now makes unshippable.
    *
    * The old blind spot — an eager `localCheckpoint` truncates the
    * logical plan, hiding any window UPSTREAM of it — is closed since
    * round 12: the audited sweep below ([[audits]], via
    * [[graft.Pin.audited]]) re-runs both counters on every
    * checkpoint-hidden segment, and its totals are gated too.
    */
  private val boundedGlobalWindows: Map[String, Int] = Map(
    "eval_auc_ranksum" -> 1, // ≤1001-row capped-score histogram cumsum
    "eval_pr_curve" -> 2, // same ≤1001-row histogram: desc cumsum + total
    "text_heaps_curve" -> 2, // ≤64-row log-bucket frame: tokens + vocab cumsums
    "ev_seasonality" -> 1, // 168-row (7 dow × 24 hod) share frame
    "ev_whale_curve" -> 1, // 10-row decile cumulative-share frame
    "graph_common_neighbors" -> 1, // 20-row post-limit top-pairs frame
    "pipeline_stage_funnel" -> 1, // ≤5-row stage-funnel lag frame
    "q46_top_customers" -> 1, // 20-row post-limit top-k frame
    "q49_unshipped_orders" -> 1, // 10-row post-limit top-revenue frame
    "sample_alpha" -> 2, // |langs|-row target-share + achievable-total
    "sample_mixture" -> 1, // |domains|-row achievable-total frame
    "sample_soft_budget" -> 1, // ≤1001-bucket ttr cumsum frame
    "sample_token_budget" -> 1, // ≤1001-bucket ttr cumsum frame
    "sim_ivf_balance" -> 1, // |cells|-row share frame (cells = config knob)
    "sim_ivf_split" -> 1, // |cells|-row hot-cell mass frame (same shape)
    "sim_outliers" -> 1, // 20-row post-limit outlier-queue frame
    "text_bm25_topk" -> 1, // 10-row post-limit top-score frame
    "text_cooccur_lift" -> 1, // 20-row post-limit top-lift frame
    "text_rake_phrases" -> 1, // 20-row post-limit top-phrase frame
    "ev_survival_table" -> 1, // ≤|calendar-days| life-table fold
    // |groups|-row (3 return flags) strictly-earlier offset cumsum —
    // the composite-order weighted median's group-offset table
    "stat_weighted_median" -> 1,
    "graph_resource_alloc" -> 1, // 20-row post-limit top-pairs frame
    "text_winnowing" -> 1, // 20-row post-limit top-matches frame
    // <=|calendar-days| daily frame: the centered 7-day MA window runs
    // on the day-folded bounded frame, never the corpus (r14)
    "ev_stl_daily" -> 1,
    // r16: the fixed-grid quantile sketch's cumulative readout — the
    // window runs over the ≤|grid|-row histogram (grid = range/width,
    // a configuration constant ~1.3k buckets), never the corpus
    "sketch_quantile" -> 1)

  /** TOTAL cross-join budget per query over the WHOLE plan — final frame
    * PLUS every checkpoint-hidden segment the audited build reports
    * ([[graft.Pin.audited]]). This closes [[boundedGlobalWindows]]'s old
    * blind spot from the cross side: the extra counts beyond
    * [[intentionalCross]] are the same bounded-broadcast shapes, now
    * visible where they are built instead of truncated away —
    * dominated by the k-means fit's per-iteration 8-row centroid cross
    * (every `sim_ivf_*`/`dedup_semantic`/`sim_diversity_sample` entry),
    * the per-merge-round 1-row winner/total crosses of the BPE chain,
    * and the per-segment re-appearance of the already-justified 1-row
    * summary-frame crosses. Calibrated by
    * `sbt "runMain graft.PlanDump --full-sweep"` (tmp/full_sweep_r12b).
    * The window sweep needs NO separate full-plan whitelist: the audited
    * totals match [[boundedGlobalWindows]] exactly — no unpartitioned
    * window was hiding behind a checkpoint.
    */
  private val fullPlanCross = Map(
    "dedup_semantic" -> 4,
    "dq_category_drift" -> 5,
    "dq_numeric_drift" -> 3,
    "dq_chi_square" -> 1, // the 1-row N frame (r13 session 2)
    "dq_benford" -> 2, // the two per-column 1-row totals (r13 session 2)
    "ev_acf" -> 4, // 3× the 1-row (n,Σx) cross + the 1-row den (r13 s3)
    "ev_markov_stationary" -> 1, // the 1-row total-mass frame (r13 s3)
    "ev_cuped" -> 1, // the 1-row pooled-moment frame (r16)
    // r17 (was 3): the pre-rescale pin leaves each round's 1-row rescale
    // cross in the NEXT segment (3 rounds) + the final readout's lazy
    // rescale + the wins fold — same intentional divisors, new residence
    "eval_bradley_terry" -> 5,
    "stat_perm_test" -> 2, // 1-row observed + 1-row count frames (r16)
    "eval_ndcg" -> 1, // the 10-vector broadcast query set (r13 s3)
    "eval_rank_battery" -> 1, // same shared probe broadcast (r13 s3)
    // the 1-row shift fold crossed into the matrix + one 1-row rescale
    // divisor per power-iteration round (8), all behind the round pins
    "emb_pca_power" -> 9,
    "ev_survival_table" -> 1, // the 1-row censor clock (r13 session 2)
    "rec_market_basket" -> 1, // the 1-row basket-total N (r13 session 3)
    "sketch_cms_join_card" -> 1, // the 1-row exact-size frame (r13 s3)
    "ev_whale_curve" -> 1,
    "graph_diameter_probe" -> 1,
    "kv_scan_count" -> 2,
    "q25_range_join" -> 1,
    "q52_supplier_value_share" -> 1,
    "q57_dormant_rich" -> 1,
    "sample_epoch_mix" -> 1,
    "sample_soft_budget" -> 2,
    "sample_token_budget" -> 2,
    "sim_cosine_topk" -> 1,
    "sim_knn_classify" -> 1,
    "sim_hybrid_rrf" -> 2, // + the 1-row ndocs df-prune frame (r13)
    "sim_diversity_sample" -> 9,
    "sim_hard_negatives" -> 1,
    "sim_ivf_assign" -> 4,
    "sim_ivf_balance" -> 4,
    "sim_ivf_forget" -> 4,
    "sim_ivf_recall" -> 6,
    "sim_ivf_refresh" -> 5,
    "sim_ivf_split" -> 4,
    "sim_ivf_topk" -> 5,
    "sim_ivfpq_topk" -> 4,
    "sim_lsh_recall" -> 1,
    "sim_matryoshka_recall" -> 2,
    "sim_mips_topk" -> 1,
    "sim_mmr_rerank" -> 1,
    "sim_pq_recall" -> 1,
    "sim_range_search" -> 1,
    "sim_recall_curve" -> 1,
    "sim_sq_recall" -> 2,
    "sim_sq_spearman" -> 2,
    "sim_sq_topk" -> 1,
    "sketch_bloom_filter" -> 1,
    "sketch_hll_sweep" -> 1,
    "sketch_kmv_setops" -> 1,
    "text_bm25_topk" -> 1,
    "text_bpe_encode" -> 3,
    "text_bpe_train" -> 6,
    "text_cooccur_lift" -> 2,
    "text_corpus_profile" -> 3,
    "text_dsir_weights" -> 1,
    "text_lang_nb" -> 2,
    "text_langid_margin" -> 2,
    "text_ppl_buckets" -> 1,
    "text_surprisal" -> 1,
    "text_zipf_curve" -> 1,
    // r14: NB candidate-set crosses behind the prediction pins (the
    // text_lang_nb shape, both classifier branches)
    "eval_mcnemar" -> 2,
    // r14: the k-means fit's per-iteration 8-row centroid cross behind
    // the fit pins — the sim_ivf_assign full-plan shape
    "sim_dbscan_ivf" -> 4,
    // r14: the 1-row ndocs idf frame + a 1-row rescale divisor per
    // ping-pong half-round (8), all behind the round pins — the
    // emb_pca_power full-plan shape
    "text_lsa_power" -> 9,
    // r15: the jackknife adds the pinned ≤8-row rpm segment (its two
    // 1-row totals) behind the final segment's 5 — 7 across the plan
    "dedup_recall_audit_sampled" -> 7,
    // r15: one 1-row max-div rescale divisor per HITS half-round
    // (2 × 3 rounds); r17 (+1): the pre-rescale pin leaves the divisors
    // in the consuming segments and the final readout carries TWO lazy
    // rescales (a and h) — 7 of the same bounded 1-row crosses
    "graph_hits" -> 7,
    // r15: the k-means fit's per-iteration 8-row centroid cross behind
    // the fit pins + the 8-row centroid distance fan in the dall
    // segment — the sim_dbscan_ivf full-plan shape
    "sim_silhouette" -> 4)

  private case class Audit(wFinal: Int, cFinal: Int, wTotal: Int,
      cTotal: Int, err: Option[String])

  /** ONE audited build per query, shared by all three sweeps: the final
    * frame's counts (the pre-round-12 sweeps) plus the totals across
    * every checkpoint-hidden segment. `Pin.audited` keeps the
    * checkpoints (an un-pinned rebuild recreates the plan-doubling
    * anti-patterns the pins prevent and breaks checkpoint-dependent
    * self-joins) — each segment is swept exactly where it was built.
    */
  private lazy val audits: Map[String, Audit] = {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    def wCount(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }.length
    def cCount(df: org.apache.spark.sql.DataFrame): Int =
      "BroadcastNestedLoopJoin|CartesianProduct".r
        .findAllMatchIn(df.queryExecution.executedPlan.toString).length
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      var wSeg = 0
      var cSeg = 0
      try {
        val df = graft.Pin.audited { seg =>
          wSeg += wCount(seg); cSeg += cCount(seg)
        } { fn(spark, sf("sf0.001")) }
        val (wf, cf) = (wCount(df), cCount(df))
        name -> Audit(wf, cf, wf + wSeg, cf + cSeg, None)
      } catch {
        case e: Throwable => name -> Audit(-1, -1, -1, -1,
          Some(s"${e.getClass.getSimpleName}: " +
            String.valueOf(e.getMessage).take(200)))
      }
    }.toMap
  }

  test("every query builds under the audited sweep") {
    val failed = audits.collect { case (n, a) if a.err.isDefined =>
      s"$n: ${a.err.get}" }
    assert(failed.isEmpty, failed.mkString("\n"))
  }

  test("no query plans a Window over an unpartitioned unbounded frame") {
    val offenders = audits.toSeq.sortBy(_._1).collect {
      case (name, a)
          if a.wFinal > boundedGlobalWindows.getOrElse(name, 0) =>
        s"$name=${a.wFinal}"
    }
    assert(offenders.isEmpty,
      "unpartitioned windows: " + offenders.mkString(", "))
  }

  test("no query plans an accidental nested-loop or cartesian join") {
    val offenders = audits.toSeq.sortBy(_._1).collect {
      case (name, a) if a.cFinal > intentionalCross.getOrElse(name, 0) =>
        s"$name=${a.cFinal}"
    }
    assert(offenders.isEmpty, "cross-joins: " + offenders.mkString(", "))
  }

  test("the sweeps hold over checkpoint-hidden segments too (audited pins)") {
    val wOff = audits.toSeq.sortBy(_._1).collect {
      case (name, a)
          if a.wTotal > boundedGlobalWindows.getOrElse(name, 0) =>
        s"$name=${a.wTotal}"
    }
    val cOff = audits.toSeq.sortBy(_._1).collect {
      case (name, a) if a.cTotal > fullPlanCross
            .getOrElse(name, intentionalCross.getOrElse(name, 0)) =>
        s"$name=${a.cTotal}"
    }
    assert(wOff.isEmpty && cOff.isEmpty,
      s"full-plan windows: ${wOff.mkString(", ")}; " +
        s"full-plan crosses: ${cOff.mkString(", ")}")
  }
}
