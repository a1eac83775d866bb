#!/usr/bin/env python3
"""Tests for tools/bench_compare.py — specifically the two-canary refusal
logic the round-11 verdict asked for: a window whose SHUFFLE canary is hot
must be refused (no delta table) even when the scan canary reads clean,
because that is exactly the contamination shape that corrupted BENCH_r11's
shuffle-heavy tail while the scan canary certified the window.

Run: python3 tools/test_bench_compare.py
"""
import contextlib
import io
import importlib.util
import json
import os
import sys
import tempfile
import unittest

HERE = os.path.dirname(os.path.abspath(__file__))
spec = importlib.util.spec_from_file_location(
    "bench_compare", os.path.join(HERE, "bench_compare.py"))
bc = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bc)


def artifact(scan=0.25, shuffle=0.45, q1=1.0, q2=2.0, extra="",
             long=None, q_long=None, epoch=None):
    """Raw Bench stdout: a spread line + the compact line.

    `long`: kv_long_canary min (None = absent, the pre-round-15 shape).
    `q_long`: an extra long-class query q_gamma's min (None = absent).
    `epoch`: aria_sec_per_epoch (None = absent)."""
    longq = ('"kv_long_canary":[%.3f,%.3f,%.3f],' % (long, long, long)
             if long is not None else "")
    gammaq = ('"q_gamma":[%.3f,%.3f,%.3f],' % (q_long, q_long, q_long)
              if q_long is not None else "")
    total = (scan + shuffle + q1 + q2 + (long or 0) + (q_long or 0))
    full = ('{"metric":"total_full","value":%.3f,"unit":"sec","queries":{'
            '"kv_scan_count":[%.3f,%.3f,%.3f],'
            '"kv_shuffle_canary":[%.3f,%.3f,%.3f],%s%s'
            '"q_alpha":[%.3f,%.3f,%.3f],"q_beta":[%.3f,%.3f,%.3f]},'
            '"sf":"sf0.1","iters":3%s}'
            % (total, scan, scan, scan,
               shuffle, shuffle, shuffle, longq, gammaq,
               q1, q1, q1, q2, q2, q2, extra))
    longc = (',"canary_kv_long":%.3f' % long if long is not None else "")
    epochc = (',"aria_sec_per_epoch":%.3f' % epoch
              if epoch is not None else "")
    compact = ('{"metric":"total","value":%.3f,"unit":"sec","sf":"sf0.1",'
               '"iters":3,"nq":4,"qsum":%.3f,'
               '"canary_kv_scan_count":%.3f,"canary_kv_shuffle":%.3f%s%s%s,'
               '"queries":{"q_beta":%.3f,"q_alpha":%.3f}}'
               % (total, total, scan, shuffle, longc, epochc, extra,
                  q2, q1))
    return full + "\n" + compact + "\n"


def run_compare(old_text, new_text, *flags, history=None, floors=None):
    """-> (exit_code, stdout) of bench_compare.main on two raw artifacts.
    `history`: optional list of raw artifact texts passed via --history.
    `floors`: optional dict query->floor written to a temp FLOORS.json
    and passed via --floors (exercises the default-floors path); when
    None the tests run hermetically via --no-floors so the repo's real
    FLOORS.json cannot leak into synthetic scenarios."""
    with tempfile.TemporaryDirectory() as d:
        po, pn = os.path.join(d, "old.out"), os.path.join(d, "new.out")
        open(po, "w").write(old_text)
        open(pn, "w").write(new_text)
        args = [po, pn, *flags]
        if floors is not None:
            fp = os.path.join(d, "FLOORS.json")
            with open(fp, "w") as f:
                json.dump({"windows": ["w1"], "floors": floors}, f)
            args += ["--floors", fp]
        elif history is None and "--no-floors" not in flags:
            args += ["--no-floors"]
        if history is not None:
            hp = []
            for i, text in enumerate(history):
                p = os.path.join(d, "clean%d.out" % i)
                open(p, "w").write(text)
                hp.append(p)
            args += ["--history", ",".join(hp)]
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = bc.main(args)
    return rc, buf.getvalue()


class CanaryRefusal(unittest.TestCase):

    def test_clean_sides_no_deltas(self):
        rc, out = run_compare(artifact(), artifact())
        self.assertEqual(rc, 0)
        self.assertIn("clean", out)
        self.assertIn("no per-query delta", out)

    def test_real_regression_still_reported_when_clean(self):
        rc, out = run_compare(artifact(q2=2.0), artifact(q2=3.5))
        self.assertEqual(rc, 1)
        self.assertIn("REGRESSIONS", out)
        self.assertIn("q_beta", out)

    def test_hot_shuffle_canary_refuses_even_with_clean_scan(self):
        # the BENCH_r11 failure shape: scan canary at floor, shuffle-side
        # contention inflating heavy queries — deltas must NOT be printed
        rc, out = run_compare(artifact(),
                              artifact(shuffle=1.30, q2=3.5))
        self.assertEqual(rc, 2)
        self.assertIn("CONTAMINATED", out)
        self.assertIn("[REFUSED] canary contamination", out)
        self.assertNotIn("REGRESSIONS", out)

    def test_hot_scan_canary_refuses(self):
        rc, out = run_compare(artifact(scan=0.80), artifact())
        self.assertEqual(rc, 2)
        self.assertIn("CONTAMINATED", out)
        self.assertNotIn("REGRESSIONS", out)

    def test_missing_shuffle_canary_warns_but_compares(self):
        # pre-round-12 artifacts lack the shuffle canary: still comparable
        # (the scan canary vouches as before), with an explicit caveat
        old = artifact().replace(',"canary_kv_shuffle":0.450', "") \
            .replace('"kv_shuffle_canary":[0.450,0.450,0.450],', "")
        rc, out = run_compare(old, artifact())
        self.assertEqual(rc, 0)
        self.assertIn("kv_shuffle_canary not present", out)

    def test_failed_queries_refuse_exit_3(self):
        rc, out = run_compare(artifact(), artifact(extra=',"failed_n":2'))
        self.assertEqual(rc, 3)
        self.assertIn("[REFUSED]", out)
        self.assertNotIn("REGRESSIONS", out)

    def test_poisoned_canary_refuses_exit_3(self):
        # round 9 signature: mid-run death -> time-to-throw readings
        rc, out = run_compare(artifact(), artifact(shuffle=0.004))
        self.assertEqual(rc, 3)
        self.assertIn("implausibly fast", out)

    def test_aborted_run_refuses_exit_3(self):
        rc, _ = run_compare(artifact(), artifact(extra=',"aborted":true'))
        self.assertEqual(rc, 3)


class AmbientNormalization(unittest.TestCase):
    """The canary-ratio normalization pass (VERDICT r13 #3): two windows
    can both pass the 2x-floor gate while sitting at different ambient
    bands; deltas explained by the canary shift must not read as
    regressions."""

    def test_uniform_band_shift_is_explained_not_regressed(self):
        # NEW runs x1.5 hot across the board INCLUDING the shuffle canary
        # (still under the 2x floor): every raw delta is weather
        rc, out = run_compare(
            artifact(shuffle=0.45, q1=1.0, q2=2.0),
            artifact(shuffle=0.675, q1=1.5, q2=3.0))
        self.assertEqual(rc, 0)
        self.assertIn("[ambient] kv_shuffle_canary NEW/OLD = x1.50", out)
        self.assertNotIn("REGRESSIONS", out)
        self.assertIn("ambient-explained", out)
        self.assertIn("q_beta", out)

    def test_genuine_regression_survives_normalization(self):
        # q_beta runs x3 while the band itself is only x1.5 — after
        # normalization it still trips the gates and must be reported
        rc, out = run_compare(
            artifact(shuffle=0.45, q2=2.0),
            artifact(shuffle=0.675, q2=6.0))
        self.assertEqual(rc, 1)
        self.assertIn("REGRESSIONS", out)
        self.assertIn("canary-normalized", out)
        self.assertIn("q_beta", out)

    def test_small_canary_drift_does_not_normalize(self):
        # a x1.1 canary drift is within same-code noise: no ambient line,
        # raw gates apply unchanged
        rc, out = run_compare(
            artifact(shuffle=0.45, q2=2.0),
            artifact(shuffle=0.495, q2=3.5))
        self.assertEqual(rc, 1)
        self.assertNotIn("[ambient]", out)
        self.assertIn("REGRESSIONS", out)

    def test_cooler_new_window_normalizes_up(self):
        # NEW ran on a QUIETER box: an apparent improvement that is just
        # the band cooling must be explained, not celebrated
        rc, out = run_compare(
            artifact(shuffle=0.675, q1=1.5, q2=3.0),
            artifact(shuffle=0.45, q1=1.0, q2=2.0))
        self.assertEqual(rc, 0)
        self.assertIn("[ambient]", out)
        self.assertNotIn("improvements", out)
        self.assertIn("ambient-explained", out)

    def test_replays_r12_vs_r13_false_regression_collapse(self):
        # the motivating case on the REAL artifacts: r13's graded window
        # ran x1.51 hot on the shuffle canary vs r12's and manufactured
        # 34 apparent regressions; normalized, the list must collapse to
        # at most a handful (the genuinely-suspect co-tenancy bursts)
        r12 = os.path.join(HERE, "..", "BENCH_r12.json")
        r13 = os.path.join(HERE, "..", "BENCH_r13.json")
        if not (os.path.exists(r12) and os.path.exists(r13)):
            self.skipTest("driver artifacts not present")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            bc.main([r12, r13])
        out = buf.getvalue()
        self.assertIn("[ambient] kv_shuffle_canary NEW/OLD = x1.51", out)
        self.assertIn("ambient-explained", out)
        n_regr = len([l for l in out.splitlines()
                      if l.startswith("  ") and "normalized" in l
                      and "raw" not in l and "->" in l])
        self.assertLess(n_regr, 10, out)


class LongClassNormalization(unittest.TestCase):
    """The third (LONG) canary + per-class normalization (VERDICT r14 #1):
    round 14's weather was length-dependent — long multi-stage queries
    inflated x1.3-1.9 while the short canaries read x1.1 — so long rows
    normalize by the long canary and real short/long disagreement refuses
    total-level comparison."""

    def test_long_weather_explained_by_long_canary(self):
        # long canary and the long query q_gamma both x1.6 hot while the
        # short canaries sit at floor: the r14 shape — must be explained
        rc, out = run_compare(
            artifact(long=2.6, q_long=5.0),
            artifact(long=4.16, q_long=8.0))
        self.assertEqual(rc, 0)
        self.assertIn("[ambient] kv_long_canary NEW/OLD = x1.60", out)
        self.assertIn("ambient-explained", out)
        self.assertIn("q_gamma", out)
        self.assertNotIn("REGRESSIONS", out)

    def test_long_regression_survives_long_normalization(self):
        # q_gamma runs x3 while the long band is only x1.6
        rc, out = run_compare(
            artifact(long=2.6, q_long=5.0),
            artifact(long=4.16, q_long=15.0))
        self.assertEqual(rc, 1)
        self.assertIn("REGRESSIONS", out)
        self.assertIn("q_gamma", out)

    def test_short_rows_do_not_ride_the_long_normalizer(self):
        # long canary x1.6 hot but q_alpha (0.9s, short class) also x1.6:
        # the short canaries are at floor, so q_alpha's delta is NOT
        # long-class weather and must be reported
        rc, out = run_compare(
            artifact(long=2.6, q1=0.9),
            artifact(long=4.16, q1=1.44))
        self.assertEqual(rc, 1)
        self.assertIn("q_alpha", out)
        self.assertIn("REGRESSIONS", out)

    def test_disagreeing_canaries_refuse_total(self):
        # short canaries at floor, long canary x1.6: length-dependent
        # weather — the total is not a comparable number
        rc, out = run_compare(
            artifact(long=2.6),
            artifact(long=4.16))
        self.assertIn("canaries disagree", out)
        self.assertIn("NOT comparable", out)

    def test_agreeing_canaries_keep_total(self):
        rc, out = run_compare(
            artifact(long=2.6),
            artifact(long=2.7))
        self.assertNotIn("NOT comparable", out)
        self.assertIn("[total]", out)

    def test_hot_long_canary_refuses_window(self):
        # >= 2x the 4.00 floor: the window itself is contaminated
        rc, out = run_compare(artifact(long=3.7),
                              artifact(long=8.1))
        self.assertEqual(rc, 2)
        self.assertIn("CONTAMINATED", out)

    def test_proxy_fallback_labeled_for_old_artifacts(self):
        # neither side carries the long canary (pre-round-15): with >= 3
        # common long rows the median ratio stands in, clearly labeled
        old = artifact(q1=2.5, q2=3.0, q_long=5.0)
        new = artifact(q1=4.0, q2=4.8, q_long=8.0)
        rc, out = run_compare(old, new)
        self.assertIn("PROXY", out)
        self.assertIn("self-normalized", out)

    def test_replays_r13_vs_r14_long_class_collapse(self):
        # the motivating case on the REAL artifacts: r14's graded window
        # read 17 apparent x1.3-1.9 regressions at short-canary ratio
        # x1.12 — length-dependent weather. With the proxy long-class
        # normalizer the list must collapse well below that.
        r13 = os.path.join(HERE, "..", "BENCH_r13.json")
        r14 = os.path.join(HERE, "..", "BENCH_r14.json")
        if not (os.path.exists(r13) and os.path.exists(r14)):
            self.skipTest("driver artifacts not present")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            bc.main([r13, r14])
        out = buf.getvalue()
        self.assertIn("PROXY", out)
        self.assertIn("ambient-explained", out)
        # long-class rows the proxy must reclassify as weather
        self.assertIn("dedup_clusters", out.split("ambient-explained")[1])
        n_regr = len([l for l in out.splitlines()
                      if l.startswith("  ") and "normalized" in l
                      and "raw" not in l and "->" in l])
        self.assertLess(n_regr, 17, out)


class CanaryCodeSuspect(unittest.TestCase):
    """r14 ADVICE (medium): the canary runs the same engine code as every
    query, so an engine-wide code regression slows it too and would be
    'ambient-explained' away. With --history clean floors the two are
    separable: NEW's canary far above its own clean floor while OLD sits
    on it is the code-regression signature."""

    def test_code_suspect_warning_fires(self):
        hist = artifact(shuffle=0.45)
        rc, out = run_compare(
            artifact(shuffle=0.46, q2=2.0),
            artifact(shuffle=0.70, q2=3.1),   # engine-wide x1.55
            history=[hist])
        self.assertIn("CODE-SUSPECT", out)

    def test_no_warning_when_old_also_elevated(self):
        # both sides hot vs history: genuine weather band, not code
        hist = artifact(shuffle=0.30)
        rc, out = run_compare(
            artifact(shuffle=0.46, q2=2.0),
            artifact(shuffle=0.48, q2=2.1),
            history=[hist])
        self.assertNotIn("CODE-SUSPECT", out)

    def test_caveat_printed_when_normalizing_without_history(self):
        rc, out = run_compare(
            artifact(shuffle=0.45, q2=2.0),
            artifact(shuffle=0.675, q2=3.0))
        self.assertIn("indistinguishable from weather", out)


class AriaEpochMetric(unittest.TestCase):
    """VERDICT r14 #7: aria_sec_per_epoch is a tracked bench metric with
    its own regression gate."""

    def test_epoch_metric_compared(self):
        rc, out = run_compare(artifact(epoch=0.40), artifact(epoch=0.42))
        self.assertEqual(rc, 0)
        self.assertIn("[aria] sec/epoch 0.400 -> 0.420", out)

    def test_epoch_regression_trips_exit(self):
        rc, out = run_compare(artifact(epoch=0.40), artifact(epoch=0.80))
        self.assertEqual(rc, 1)
        self.assertIn("REGRESSION", out)

    def test_epoch_weather_explained_by_long_canary(self):
        rc, out = run_compare(artifact(epoch=0.40, long=2.6),
                              artifact(epoch=0.64, long=4.16))
        self.assertEqual(rc, 0)
        self.assertIn("ambient-explained", out)


class HistoryReconciliation(unittest.TestCase):
    """The per-query clean-history pass (VERDICT r12 #2): a single-query
    burst inside a canary-clean window must be flagged SUSPECT."""

    def test_suspect_flagged_without_changing_exit_code(self):
        # q_beta reads 5.0s in the canary-clean NEW window, but both
        # clean history windows put its floor at 2.0s -> SUSPECT; OLD has
        # the same 5.0s reading so there is no delta, and exit stays 0
        rc, out = run_compare(artifact(q2=5.0), artifact(q2=5.0),
                              history=[artifact(q2=2.0),
                                       artifact(q2=2.2)])
        self.assertEqual(rc, 0)
        self.assertIn("SUSPECT", out)
        self.assertIn("q_beta: 5.000s vs clean min 2.000s", out)
        self.assertIn("re-read before treating as a regression", out)

    def test_regression_annotated_when_also_suspect(self):
        # the round-12 graph_triangles shape: a x4 graded reading that IS
        # a delta vs OLD but sits far above its own clean history —
        # reported as a regression AND cross-marked suspect
        rc, out = run_compare(artifact(q2=1.0), artifact(q2=4.0),
                              history=[artifact(q2=1.0)])
        self.assertEqual(rc, 1)
        self.assertIn("[SUSPECT — see below]", out)

    def test_below_2x_history_not_suspect(self):
        rc, out = run_compare(artifact(q2=2.0), artifact(q2=2.0),
                              history=[artifact(q2=1.2)])
        self.assertEqual(rc, 0)
        self.assertNotIn("SUSPECT", out)

    def test_contaminated_history_window_skipped(self):
        # a hot-canary window must not define a clean floor: with only a
        # contaminated "clean" window offered, no floors exist and the
        # burst goes unflagged (with the skip printed), rather than being
        # compared against a corrupted baseline
        rc, out = run_compare(artifact(q2=5.0), artifact(q2=5.0),
                              history=[artifact(q2=2.0, shuffle=1.5)])
        self.assertEqual(rc, 0)
        self.assertIn("skipped", out)
        self.assertIn("0 per-query clean floors", out)
        self.assertNotIn("SUSPECT", out)

    def test_replays_round12_graph_triangles(self):
        # the motivating case, replayed against the REAL r12 driver
        # artifact: graph_triangles read 4.09s in a canary-clean graded
        # window vs 0.96-1.21s across three clean windows — the flag must
        # fire on the genuine artifact, not only on synthetic fixtures
        r12 = os.path.join(HERE, "..", "BENCH_r12.json")
        if not os.path.exists(r12):
            self.skipTest("BENCH_r12.json not present")
        clean = ('{"metric":"total_full","value":3.0,"unit":"sec",'
                 '"queries":{"kv_scan_count":[0.250,0.250,0.250],'
                 '"kv_shuffle_canary":[0.450,0.450,0.450],'
                 '"graph_triangles":[0.960,1.050,1.210]},'
                 '"sf":"sf0.1","iters":3}\n')
        with tempfile.TemporaryDirectory() as d:
            hp = os.path.join(d, "clean.out")
            open(hp, "w").write(clean)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                rc = bc.main([r12, r12, "--history", hp])
            out = buf.getvalue()
        self.assertIn("SUSPECT", out)
        self.assertIn("graph_triangles: 4.090s vs clean min 0.960s", out)


class DefaultFloors(unittest.TestCase):
    """VERDICT r15 #2: without --history, the checked-in FLOORS.json is
    loaded by default so the honest per-query read is the default read."""

    def test_floors_power_suspect_without_history(self):
        # same burst shape as the r12 case, but floors come from the
        # persisted FLOORS.json instead of raw clean windows
        rc, out = run_compare(artifact(q2=5.0), artifact(q2=5.0),
                              floors={"q_beta": 2.0})
        self.assertEqual(rc, 0)
        self.assertIn("FLOORS.json", out)
        self.assertIn("SUSPECT", out)
        self.assertIn("q_beta: 5.000s vs clean min 2.000s", out)

    def test_no_floors_disables_default(self):
        rc, out = run_compare(artifact(q2=5.0), artifact(q2=5.0),
                              "--no-floors")
        self.assertNotIn("FLOORS.json", out)
        self.assertNotIn("SUSPECT", out)

    def test_history_overrides_floors(self):
        # explicit raw clean windows beat the persisted summary
        rc, out = run_compare(artifact(q2=5.0), artifact(q2=5.0),
                              history=[artifact(q2=1.0)])
        self.assertNotIn("FLOORS.json", out)
        self.assertIn("q_beta: 5.000s vs clean min 1.000s", out)

    def test_class_assigned_by_floor_not_inflated_old_min(self):
        # r15 ADVICE: q_beta's OLD min reads 2.4s (weather-inflated past
        # the 2s boundary) but its clean floor is 1.5s — the row must
        # classify SHORT (printed [S]) and normalize by the shuffle
        # canary, not silently flip onto the long normalizer
        rc, out = run_compare(
            artifact(q2=2.4, shuffle=0.45, long=3.0),
            artifact(q2=3.6, shuffle=0.675, long=3.0),
            floors={"q_beta": 1.5, "kv_shuffle_canary": 0.45,
                    "kv_long_canary": 3.0, "kv_scan_count": 0.25,
                    "q_alpha": 1.0})
        # the row lands in ambient-explained, classified SHORT and
        # normalized by the shuffle canary's x1.5 (if it had flipped to
        # the long class its normalizer would be x1.00 and the row would
        # print as a x1.5 REGRESSION)
        self.assertIn("[S] q_beta: 2.400s -> 3.600s raw (x1.50), "
                      "normalized 2.400s (x1.00)", out)
        self.assertEqual(rc, 0)


class RetryAnnotation(unittest.TestCase):
    """VERDICT r15 #1/#8: Bench's in-session retry annotation. A retried
    reading that still regresses is a reproducing slowdown and must gate
    as a REGRESSION — the retry must not mask it, and ambient
    normalization must not excuse it."""

    def test_retried_and_still_regressed_prints_regression(self):
        # q_beta was retried in-session and still reads x1.5 vs OLD while
        # the window's shuffle canary shift would have explained it away —
        # the retry already tested the weather explanation, so the row
        # gates raw and the exit code is 1 (the r15 #8 unit test)
        ann = ',"retried":["q_beta"]'
        rc, out = run_compare(
            artifact(q2=2.0, shuffle=0.45),
            artifact(q2=3.0, shuffle=0.675, extra=ann),
            floors={"q_beta": 1.0, "kv_shuffle_canary": 0.45,
                    "kv_scan_count": 0.25, "q_alpha": 1.0})
        self.assertEqual(rc, 1, out)
        self.assertIn("REGRESSIONS", out)
        self.assertIn("q_beta", out)
        self.assertIn("[retry] NEW retried 1 query", out)

    def test_retried_suspect_escalated_not_advisory(self):
        # still >=2x its clean floor AFTER retry: the burst explanation
        # was tested and failed — no advisory SUSPECT excuse
        ann = ',"retried":["q_beta"]'
        rc, out = run_compare(
            artifact(q2=1.0), artifact(q2=3.0, extra=ann),
            floors={"q_beta": 1.0})
        self.assertEqual(rc, 1)
        self.assertIn("RETRIED, STILL x3.00", out)
        self.assertNotIn("re-read before treating as a regression", out)

    def test_unretried_suspect_stays_advisory(self):
        rc, out = run_compare(
            artifact(q2=3.0), artifact(q2=3.0),
            floors={"q_beta": 1.0})
        self.assertEqual(rc, 0)
        self.assertIn("re-read before treating as a regression", out)

    def test_retry_that_recovered_is_just_annotated(self):
        # retried and the surviving min is clean: annotation printed, no
        # regression manufactured
        ann = ',"retried":["q_beta"]'
        rc, out = run_compare(
            artifact(q2=2.0), artifact(q2=2.1, extra=ann),
            floors={"q_beta": 2.0})
        self.assertEqual(rc, 0)
        self.assertIn("[retry] NEW retried 1 query", out)
        self.assertNotIn("REGRESSIONS", out)


class ProxyGating(unittest.TestCase):
    """r15 ADVICE (low): the PROXY long-class normalizer is self-
    normalized from the long rows themselves; without independent clean
    floors it must report but not GATE — a uniform long-class code
    regression must not exit 0."""

    def test_uniform_long_regression_exits_1_without_floors(self):
        # pre-r15 shape: no long canary on either side; all three long
        # rows (q_alpha 2.5->3.75, q_beta 2.0->3.0, q_gamma 4.0->6.0)
        # regress x1.5 uniformly; the proxy median (x1.5) would
        # previously reclassify them all as ambient-explained and exit 0
        rc, out = run_compare(
            artifact(q1=2.5, q2=2.0, q_long=4.0),
            artifact(q1=3.75, q2=3.0, q_long=6.0),
            "--no-floors")
        self.assertEqual(rc, 1, out)
        self.assertIn("display-only", out)
        self.assertIn("PROXY", out)

    def test_real_long_canary_still_gates(self):
        # with the REAL long canary moving x1.5 in step, the same row
        # shifts are weather and exit stays 0 (no proxy involved)
        rc, out = run_compare(
            artifact(q2=2.0, q_long=4.0, long=3.0),
            artifact(q2=3.0, q_long=6.0, long=4.5),
            "--no-floors")
        self.assertEqual(rc, 0, out)
        self.assertIn("ambient-explained", out)


if __name__ == "__main__":
    unittest.main(verbosity=2)
