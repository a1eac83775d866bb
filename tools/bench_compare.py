#!/usr/bin/env python3
"""Compare two graft bench artifacts: per-query min-vs-min deltas beyond a
noise floor, plus canary contamination flags.

Usage:
  python3 tools/bench_compare.py OLD NEW [--abs 0.15] [--rel 1.3]
      [--history clean1.out,clean2.out,...]

OLD/NEW each accept either
  - a driver artifact (BENCH_r{N}.json: {"tail": ..., "parsed": ...} — the
    tail holds the last 2000 chars of Bench stdout, i.e. a truncated
    per-query [min,med,max] line followed by the complete compact line), or
  - raw Bench stdout (the two JSON lines Bench prints).

Per-query minimum is taken from the full spread line where readable and
from the compact line otherwise, so the comparison covers every query the
artifacts preserve. A delta is reported only when BOTH gates trip:
|new-old| > --abs seconds AND max/min ratio > --rel. This box's measured
same-code noise is ~1.3x per query (VERDICT r8), hence the defaults.

Canaries: THREE fixed queries whose mins only move with machine
conditions, never query code. kv_scan_count is a pure-count scan (CPU /
page-cache co-tenancy; clean floor ~0.25s at sf0.1); kv_shuffle_canary
is a fixed join+agg through a real exchange (shuffle-side contention —
round 11's graded window inflated shuffle-heavy queries 1.2-1.8x while
the scan canary sat at its floor; clean floor ~0.45s at sf0.1);
kv_long_canary (round 15) is a pinned 5-round BSP — the long multi-stage
job profile, because round 14 measured the weather to be
LENGTH-DEPENDENT (long queries x1.3-1.9 hot at short-canary x1.1). A
side reading ANY canary >= 2x its floor is CONTAMINATED and the tool
REFUSES to print a delta table — cross-window deltas off such a side
are manufactured noise, not measurements.

Per-CLASS ambient normalization (round 15): short rows (OLD min under
2s) normalize by the shuffle/scan canary ratio, long rows by the long
canary's ratio (falling back, for pre-round-15 artifacts, to the median
ratio of the long rows themselves — printed as PROXY since it is
self-normalized). When the REAL short and long canaries disagree by
more than x1.3, the weather is length-dependent and no single number
describes the window: total-level comparison is refused outright.

Code-vs-weather separation (r14 ADVICE): the canaries run the same
engine code as every query, so an engine-wide code regression slows
them too and masquerades as ambient. With --history, each canary's NEW
reading is checked against its own clean-history floor: NEW far above
the floor while OLD sits on it prints a CODE-SUSPECT warning instead of
silently normalizing the regression away.

A side whose artifact records failed queries (failed_n > 0 / a "failed"
list) or an aborted run ("aborted":true — the SparkContext died mid-run)
is NOT a set of measurements, and the tool REFUSES to compare: exit 3,
no delta table. A below-floor canary is treated the same way (it is the
failure signature round 9 taught us), not merely flagged.

Ambient normalization (VERDICT r13 #3): two windows can BOTH pass the
2x-floor gate while running at different ambient co-tenancy bands — round
13's graded window ran its common-query median x1.53 hot vs round 12's
while the shuffle canary ratio read x1.51, manufacturing 34 apparent
"regressions" that were weather, not code. When the canary-to-canary
ratio between the sides exceeds x1.15 (either direction), NEW's readings
are normalized by that ratio before the regression gates are applied:
rows that trip raw but not normalized are printed separately as
"ambient-explained", not as regressions, and the total line gains a
normalized column. The shuffle canary is preferred as the normalizer
(most queries are shuffle-bound; round 13's evidence), falling back to
the scan canary for pre-round-12 artifacts. Beyond x1.3 the tool also
states that total-level comparison is not meaningful and directs readers
to the clean-window history.

--history: the per-QUERY reconciliation pass (VERDICT r12 #2). The
window-level canaries certify the WINDOW; a query-long co-tenancy burst
inside an otherwise-clean window still corrupts that one query's reading
(round 12: graph_triangles 4.09s graded vs 0.96-1.21s across three clean
windows, canaries clean). Pass the persisted clean-window artifacts
(tmp/bench_clean_*.out); the tool takes each query's minimum across them
and flags any NEW reading >= 2x its own clean-history min as
"SUSPECT — re-read before treating as a regression", independent of
canary state. Suspect readings are advisory (exit code unchanged): the
right response is a re-run, not a code hunt. History sides that are
themselves bad (aborted/failed/hot-canary) are skipped with a warning —
a contaminated window must not define a query's clean floor.

When --history is NOT given, the checked-in FLOORS.json (per-query
clean-floor minima persisted by tools/make_floors.py at each
certified-clean window — VERDICT r15 #2) is loaded by default, so the
honest per-query read is the DEFAULT read, not an opt-in. --history
still overrides it (raw clean windows beat the persisted summary), and
--no-floors disables the default for tooling tests.

Retry annotation (VERDICT r15 #1/#8): Bench re-runs, in-session, any
query whose min reads >= 2x its FLOORS.json floor and records the
names under "retried":[...]. A retried query that STILL reads hot has
already had its burst explanation tested — so bench_compare (a) never
downgrades such a row to the advisory SUSPECT excuse, and (b) exempts
it from ambient normalization when gating (the retry is a same-window
re-measurement; a reading that reproduces across retries is a
reproducing slowdown, printed as a REGRESSION).

Exit codes: 0 clean, 1 regressions found, 2 canary contaminated (trumps
1; no delta table printed), 3 refused (failed/aborted/poisoned side —
nothing was compared).
"""
import json
import os
import re
import sys

# (query name, compact-line key, clean floor sec at sf0.1) — >=2x floor
# => contaminated. Floors recorded in PLANS.md (bench canary doctrine).
CANARIES = [
    ("kv_scan_count", "canary_kv_scan_count", 0.30),
    ("kv_shuffle_canary", "canary_kv_shuffle", 0.55),
    # round 15 (VERDICT r14 #1): a pinned 5-round BSP — the long
    # multi-stage job profile both short canaries are blind to. Round
    # 14's graded window inflated long queries x1.3-1.9 while the short
    # canaries read x1.1: sustained cache-pressure weather is
    # length-dependent, so the long class gets its own canary and its
    # own normalizer. Floor from two certified-clean r15 windows
    # (3.670 / 3.705 s; PLANS.md r15) with the same headroom margin the
    # short canaries carry (gate = 2x floor ~ 2.2x clean min).
    ("kv_long_canary", "canary_kv_long", 4.00),
]
CANARY_POISON_CEILING = 0.05  # below this = queries threw, not ran (r9)
# a query is LONG-class when its OLD-side min is at least this: the
# round-14 inflation band started around ~2s (mst, recall audits,
# single_linkage, kfold all sit well above it; the short tail below)
LONG_CLASS_SEC = 2.0

SPREAD_RE = re.compile(r'"([A-Za-z0-9_]+)":\[([0-9.]+),([0-9.]+),([0-9.]+)\]')
COMPACT_RE = re.compile(r'"([A-Za-z0-9_]+)":([0-9.]+)')
NON_QUERY_KEYS = ({"value", "qsum", "failed_n", "n",
                   "rc", "cpus", "sf", "iters", "nq",
                   "aria_sec_per_epoch"} |
                  {key for _q, key, _f in CANARIES})


def load_text(path):
    """Return the bench stdout text held by `path` (driver artifact or raw)."""
    raw = open(path).read()
    try:
        obj = json.loads(raw)
        if isinstance(obj, dict) and "tail" in obj:
            return obj["tail"]
    except json.JSONDecodeError:
        pass
    return raw


def parse_side(path):
    """-> (mins: {query: min_sec}, total: float|None,
           canaries: {query: min_sec}, n_spread: int, bad: str|None,
           extras: {metric: float}) for
    one artifact; `bad` is a human-readable reason the side is not a
    measurement set. `extras` carries tracked non-query metrics
    (currently aria_sec_per_epoch, the Aria flagship's per-epoch wall)."""
    text = load_text(path)
    bad = None
    if re.search(r'"aborted":true', text):
        bad = "run aborted mid-way (SparkContext died)"
    else:
        fm = re.search(r'"failed_n":(\d+)', text)
        fl = re.search(r'"failed":\[', text)
        if (fm and int(fm.group(1)) > 0) or fl:
            n = fm.group(1) if fm else "some"
            bad = f"{n} queries failed (times are time-to-throw)"
    mins = {}
    # compact line first (complete, but only the slowest queries fit)
    m = re.search(r'\{"metric":"total",.*\}', text)
    total = None
    canaries = {}
    if m:
        compact = m.group(0)
        tm = re.search(r'"value":([0-9.]+)', compact)
        total = float(tm.group(1)) if tm else None
        for qname, key, _floor in CANARIES:
            cm = re.search(r'"' + key + r'":([0-9.]+)', compact)
            if cm:
                canaries[qname] = float(cm.group(1))
        qm = re.search(r'"queries":\{(.*)\}\}', compact)
        if qm:
            for name, v in COMPACT_RE.findall(qm.group(1)):
                if name not in NON_QUERY_KEYS:
                    mins[name] = float(v)
    # full spread line (possibly head-truncated): its mins are authoritative
    n_spread = 0
    for name, lo, _med, _hi in SPREAD_RE.findall(text):
        mins[name] = float(lo)
        n_spread += 1
    for qname, _key, _floor in CANARIES:
        if qname not in canaries and qname in mins:
            canaries[qname] = mins[qname]
    for qname, c in canaries.items():
        if bad is None and c <= CANARY_POISON_CEILING:
            bad = (f"canary {qname} {c:.3f}s <= "
                   f"{CANARY_POISON_CEILING:.2f}s — implausibly fast, "
                   "the run likely died mid-way")
    extras = {}
    em = re.search(r'"aria_sec_per_epoch":([0-9.]+)', text)
    if em:
        extras["aria_sec_per_epoch"] = float(em.group(1))
    # in-session retry annotation (VERDICT r15 #1): queries whose first
    # reading hit >=2x their clean floor and were re-measured by Bench —
    # their surviving min has already had the burst explanation tested
    rm = re.search(r'"retried":\[([^\]]*)\]', text)
    if rm:
        extras["retried"] = re.findall(r'"([A-Za-z0-9_]+)"', rm.group(1))
    return mins, total, canaries, n_spread, bad, extras


def main(argv):
    args = [a for a in argv if not a.startswith("--")]
    opts = dict(a.lstrip("-").split("=", 1) if "=" in a else (a.lstrip("-"), True)
                for a in argv if a.startswith("--"))
    # also accept "--abs 0.2" style
    flat = []
    it = iter(argv)
    for a in it:
        if a in ("--abs", "--rel", "--history", "--floors"):
            opts[a.lstrip("-")] = next(it, None)
        elif not a.startswith("--"):
            flat.append(a)
    if len(flat) != 2:
        print(__doc__)
        return 64
    abs_floor = float(opts.get("abs", 0.15))
    rel_floor = float(opts.get("rel", 1.3))
    old_path, new_path = flat
    old, old_total, old_canaries, old_ns, old_bad, old_x = parse_side(old_path)
    new, new_total, new_canaries, new_ns, new_bad, new_x = parse_side(new_path)

    # a failed/aborted/poisoned side holds non-measurements: comparing it
    # would manufacture deltas out of time-to-throw readings — refuse
    refused = False
    for tag, path, bad in (("OLD", old_path, old_bad),
                           ("NEW", new_path, new_bad)):
        if bad:
            print(f"[REFUSED] {tag} ({path}): {bad} — not comparable; "
                  "re-run the bench instead of reading deltas off this artifact")
            refused = True
    if refused:
        return 3

    contaminated = False
    for tag, cs in (("OLD", old_canaries), ("NEW", new_canaries)):
        for qname, _key, floor in CANARIES:
            c = cs.get(qname)
            if c is None:
                print(f"[canary] {tag}: {qname} not present — cannot "
                      "vouch for this side's run")
            elif c >= 2 * floor:
                print(f"[canary] {tag}: {qname} min {c:.3f}s >= "
                      f"{2 * floor:.2f}s — RUN CONTAMINATED, deltas on "
                      "this side are not trustworthy")
                contaminated = True
            elif c <= CANARY_POISON_CEILING:
                # round 9: a mid-run SparkContext death made every later
                # query record its time-to-throw (~0.005s) — a canary FAR
                # BELOW floor is the failure signature, and the run's
                # "times" are not measurements at all
                print(f"[canary] {tag}: {qname} min {c:.3f}s <= "
                      f"{CANARY_POISON_CEILING:.2f}s — implausibly fast: "
                      "the run likely died mid-way (check failed_n / "
                      "stderr); times on this side are time-to-throw, "
                      "not measurements")
                contaminated = True
            else:
                print(f"[canary] {tag}: {qname} min {c:.3f}s — clean "
                      f"(floor {floor:.2f}s)")
    if contaminated:
        # a hot canary means the window itself is invalid: per-query
        # deltas off it are co-tenancy noise wearing a query's name
        # (round 11: the scan canary alone certified a window whose
        # shuffle-heavy queries ran 1.2-1.8x hot) — refuse the table
        print("[REFUSED] canary contamination — no delta table; re-run "
              "the bench on a quiet window instead of reading deltas "
              "off this one")
        return 2

    # per-query clean-history floors (VERDICT r12 #2): minimum across the
    # persisted clean windows, used to flag single-query co-tenancy bursts
    # that the window-level canaries cannot see — loaded BEFORE the
    # ambient pass because the canaries' own clean floors are what
    # separates weather from an engine-wide code regression (r14 ADVICE)
    hist = {}
    hist_n = 0
    hval = opts.get("history")
    if (not hval or hval is True) and "no-floors" not in opts:
        # default floors (VERDICT r15 #2): the checked-in FLOORS.json —
        # per-query clean minima persisted at each certified-clean window
        # by tools/make_floors.py — so the honest per-query read is the
        # DEFAULT read. --history (raw clean windows) overrides it.
        fval = opts.get("floors")
        fpath = str(fval) if fval and fval is not True else os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "..", "FLOORS.json")
        if os.path.exists(fpath):
            try:
                data = json.load(open(fpath))
                hist = {q: float(v)
                        for q, v in data.get("floors", {}).items()
                        if float(v) > CANARY_POISON_CEILING}
                hist_n = len(data.get("windows", []))
                print(f"[history] FLOORS.json (default): {len(hist)} "
                      f"per-query clean floors from {hist_n} certified "
                      "window(s); pass --history to override, "
                      "--no-floors to disable")
            except (json.JSONDecodeError, ValueError) as e:
                print(f"[history] FLOORS.json unreadable ({e}) — "
                      "no default floors")
    if hval and hval is not True:
        import glob as _glob
        paths = []
        for frag in str(hval).split(","):
            frag = frag.strip()
            if frag:
                paths.extend(sorted(_glob.glob(frag)) or [frag])
        for p in paths:
            try:
                mins, _t, cans, _n, bad, _x = parse_side(p)
            except OSError as e:
                print(f"[history] {p}: skipped (unreadable: {e})")
                continue
            hot = [q for q, _k, fl in CANARIES
                   if cans.get(q, 0) >= 2 * fl]
            if bad or hot:
                why = bad or f"hot canary {', '.join(hot)}"
                print(f"[history] {p}: skipped ({why}) — a contaminated "
                      "window must not define a clean floor")
                continue
            hist_n += 1
            for q, v in mins.items():
                hist[q] = min(hist.get(q, v), v)
        print(f"[history] {len(hist)} per-query clean floors from "
              f"{hist_n} clean window(s)")

    suspects = {q: (hist[q], new[q]) for q in new
                if q in hist and hist[q] > CANARY_POISON_CEILING
                and new[q] >= 2 * hist[q]}

    # in-session retry annotation (r15 #1/#8): a retried query's min has
    # already been re-measured inside the same window. Still >=2x its
    # clean floor => the burst explanation was tested and failed — such a
    # row must NOT be downgraded to the advisory SUSPECT excuse, and is
    # exempt from ambient normalization when gating below.
    retried = set(new_x.get("retried", []))
    persisted_hot = {q: suspects.pop(q) for q in list(suspects)
                     if q in retried}
    if retried:
        print(f"[retry] NEW retried {len(retried)} quer"
              f"{'y' if len(retried) == 1 else 'ies'} in-session "
              f"(>=2x clean floor on first reading): "
              f"{', '.join(sorted(retried))}")

    # ambient cross-window factors (VERDICT r13 #3 + r14 #1): both windows
    # passed the 2x-floor gate, but they may sit at different ambient
    # bands — and round 14 measured the band shift to be LENGTH-DEPENDENT
    # (long multi-stage queries inflated x1.3-1.9 while short canaries
    # read x1.1), so each class gets its own normalizer: short rows by the
    # shuffle/scan canary ratio, long rows (OLD min >= LONG_CLASS_SEC) by
    # the long canary's.
    common = sorted(set(old) & set(new))
    short_raw, short_src = None, None
    for qname in ("kv_shuffle_canary", "kv_scan_count"):
        a_c, b_c = old_canaries.get(qname), new_canaries.get(qname)
        if a_c and b_c and a_c > CANARY_POISON_CEILING:
            short_raw, short_src = b_c / a_c, qname
            break
    long_raw, long_src, long_proxy = None, None, False
    a_c = old_canaries.get("kv_long_canary")
    b_c = new_canaries.get("kv_long_canary")
    if a_c and b_c and a_c > CANARY_POISON_CEILING:
        long_raw, long_src = b_c / a_c, "kv_long_canary"
    else:
        # pre-round-15 artifacts lack the long canary: fall back to the
        # median ratio of the common long-class rows. SELF-normalized, so
        # it can hide a uniform long-class code regression — stated, and
        # only real-canary disagreement gates the total below.
        ratios = sorted(new[q] / old[q] for q in common
                        if old[q] >= LONG_CLASS_SEC)
        if len(ratios) >= 3:
            long_raw = ratios[len(ratios) // 2]
            long_src, long_proxy = "long-class median (PROXY)", True

    def activate(r):
        return r if r is not None and (r > 1.15 or r < 1 / 1.15) else 1.0

    short_amb = activate(short_raw)
    # with no long-class signal at all, long rows fall back to the short
    # normalizer (the pre-round-15 behavior)
    long_amb = activate(long_raw) if long_raw is not None else short_amb
    for amb, src, raw, proxy in ((short_amb, short_src, short_raw, False),
                                 (long_amb, long_src, long_raw, long_proxy)):
        if amb != 1.0 and src:
            cls = "long-class" if src == long_src else "short-class"
            pnote = (" [PROXY — self-normalized from the long rows "
                     "themselves: a uniform long-class code regression "
                     "would hide in it; the long canary replaces this "
                     "from round 15 on]" if proxy else "")
            print(f"[ambient] {src} NEW/OLD = x{raw:.2f} — {cls} NEW "
                  f"readings are canary-normalized before the "
                  f"regression gates{pnote}")
    # the canary runs the same engine code as every query: an engine-wide
    # code regression slows the canary too and masquerades as weather.
    # With --history clean floors the two are separable (r14 ADVICE):
    # NEW's canary far above its own clean floor while OLD sits on it is
    # the code-regression signature, not a band shift.
    code_suspect = False
    for qname, _key, _floor in CANARIES:
        hmin = hist.get(qname)
        a_c, b_c = old_canaries.get(qname), new_canaries.get(qname)
        if hmin and a_c and b_c and hmin > CANARY_POISON_CEILING \
                and b_c >= 1.5 * hmin and a_c <= 1.2 * hmin:
            code_suspect = True
            print(f"[canary] WARNING: {qname} NEW {b_c:.3f}s = "
                  f"x{b_c / hmin:.2f} its clean-history floor "
                  f"{hmin:.3f}s while OLD matches the floor "
                  f"(x{a_c / hmin:.2f}) — the canary runs the same "
                  "engine code as every query, so this shift is "
                  "CODE-SUSPECT (engine-wide regression shape), not "
                  "weather; do not accept the ambient normalization "
                  "without a re-run")
    if (short_amb != 1.0 or long_amb != 1.0) and not hist and not code_suspect:
        print("[ambient] caveat: a framework-wide code regression slows "
              "the canaries too and is indistinguishable from weather "
              "without clean-window history — pass --history to separate "
              "them")

    # real-canary disagreement (r14 #1): when the short and long canaries
    # measure DIFFERENT band shifts, no single number describes the
    # window and graded-to-graded totals are not comparable — per-query
    # rows are still normalized per class, the total is refused.
    totals_comparable = True
    if short_raw and long_raw and not long_proxy:
        spread = max(short_raw, long_raw) / min(short_raw, long_raw)
        if spread > 1.3:
            totals_comparable = False
            print(f"[ambient] short ({short_src} x{short_raw:.2f}) and "
                  f"long ({long_src} x{long_raw:.2f}) canaries disagree "
                  f"x{spread:.2f} > x1.3 — the weather is "
                  "length-dependent; total-level comparison REFUSED, "
                  "read the per-class normalized rows instead")

    ambient_on = short_amb != 1.0 or long_amb != 1.0

    # class assignment (r15 ADVICE): classify by the clean-history floor
    # when available — the raw OLD min can be weather-inflated past the
    # 2s boundary and silently flip a query onto the long normalizer —
    # falling back to the OLD min otherwise. The class is printed next
    # to each row so boundary flips are visible.
    def q_base(q):
        return hist.get(q, old.get(q, new.get(q, 0.0)))

    def q_is_long(q):
        return q_base(q) >= LONG_CLASS_SEC

    def cls_amb(q):
        return long_amb if q_is_long(q) else short_amb

    # gating normalizer (r15 ADVICE + #8): (a) the PROXY long normalizer
    # is self-normalized from the long rows themselves, so without
    # independent clean floors it REPORTS but does not GATE — a uniform
    # long-class code regression must not exit 0; (b) retried rows had
    # the weather explanation tested in-session, so they gate raw.
    long_amb_gate = long_amb if (not long_proxy or hist) else 1.0
    if long_proxy and not hist and long_amb != 1.0:
        print("[ambient] PROXY normalizer is display-only without clean "
              "floors: long-class rows GATE on raw readings (a uniform "
              "long-class code regression would otherwise exit 0)")

    def cls_amb_gate(q):
        if q in retried:
            return 1.0
        return long_amb_gate if q_is_long(q) else short_amb

    if old_total is not None and new_total is not None:
        if not totals_comparable:
            print(f"[total] {old_total:.1f}s -> {new_total:.1f}s raw — "
                  "NOT comparable (length-dependent weather, see above)")
        else:
            # class-normalize the total only when the parsed per-query
            # mins actually COVER it: a driver artifact's tail preserves
            # only the slowest queries, and normalizing that subset would
            # print a fictional total
            qsum = sum(new.values())
            covered = new and abs(qsum - new_total) <= 0.05 * new_total
            norm_total = sum(new[q] / cls_amb(q) for q in new)
            norm_col = (f" (normalized: {norm_total:.1f}s)"
                        if ambient_on and covered else "")
            print(f"[total] {old_total:.1f}s -> {new_total:.1f}s "
                  f"({new_total - old_total:+.1f}s){norm_col}")

    # tracked non-query metric (VERDICT r14 #7): the Aria flagship's
    # per-epoch wall, gated like a long-class query
    a_e, b_e = old_x.get("aria_sec_per_epoch"), new_x.get("aria_sec_per_epoch")
    epoch_regressed = False
    if a_e and b_e:
        bn_e = b_e / long_amb_gate
        tag = ""
        if bn_e > a_e * 1.3 and bn_e - a_e > 0.1:
            epoch_regressed = True
            tag = " — REGRESSION (beyond the long-class ambient band)"
        elif b_e > a_e * 1.3:
            tag = " — ambient-explained"
        print(f"[aria] sec/epoch {a_e:.3f} -> {b_e:.3f} "
              f"(normalized {bn_e:.3f}, x{bn_e / a_e:.2f}){tag}")
    print(f"[coverage] OLD: {len(old)} query mins ({old_ns} with spreads); "
          f"NEW: {len(new)} ({new_ns}); comparable: {len(common)}")
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    if only_old:
        print(f"[coverage] dropped in NEW (or truncated out): {', '.join(only_old)}")
    if only_new:
        print(f"[coverage] added in NEW: {', '.join(only_new)}")

    def trips(a, b):
        return abs(b - a) > abs_floor and max(a, b) > min(a, b) * rel_floor

    regressions, improvements, explained = [], [], []
    for q in common:
        a, b = old[q], new[q]
        bn = b / cls_amb(q)  # class-normalized NEW (== b when ambient off)
        bg = b / cls_amb_gate(q)  # gating-normalized (proxy/retry-aware)
        if trips(a, bg):
            (regressions if bg > a else improvements).append((bg - a, q, a, b, bn))
        elif trips(a, b):
            # raw delta exists but the window's own canary shift accounts
            # for it — weather wearing the query's name, not a regression
            explained.append((b - a, q, a, b, bn))
    for title, rows in (("REGRESSIONS", sorted(regressions, reverse=True)),
                        ("improvements", sorted(improvements))):
        if rows:
            print(f"-- {title} (|delta| > {abs_floor}s and ratio > {rel_floor}x"
                  + (", canary-normalized" if ambient_on else "") + ")")
            for d, q, a, b, bn in rows:
                tag = " [SUSPECT — see below]" if q in suspects else ""
                if q in persisted_hot:
                    h = persisted_hot[q][0]
                    tag = (f" [RETRIED, STILL x{b / h:.2f} its clean "
                           f"floor {h:.3f}s — reproducing slowdown, "
                           "not a burst]")
                elif q in retried:
                    tag = " [retried in-session; gated raw]"
                ncol = f" (normalized {bn:.3f}s, x{bn / a:.2f})" \
                    if ambient_on else ""
                cls = "L" if q_is_long(q) else "S"
                print(f"  [{cls}] {q}: {a:.3f}s -> {b:.3f}s ({d:+.3f}s, "
                      f"x{b / a:.2f}){ncol}{tag}")
    if explained:
        print(f"-- ambient-explained (raw delta within the window's own "
              f"canary band — short x{short_amb:.2f} / long "
              f"x{long_amb:.2f} — once normalized: co-tenancy, not code)")
        for d, q, a, b, bn in sorted(explained, reverse=True):
            cls = "L" if q_is_long(q) else "S"
            print(f"  [{cls}] {q}: {a:.3f}s -> {b:.3f}s raw (x{b / a:.2f}), "
                  f"normalized {bn:.3f}s (x{bn / a:.2f})")
    if not regressions and not improvements and not explained:
        print(f"-- no per-query delta beyond the noise floor "
              f"(|delta| > {abs_floor}s and ratio > {rel_floor}x)")
    if suspects:
        print("-- SUSPECT readings (NEW >= 2x its clean-history min, "
              "canaries notwithstanding)")
        for q in sorted(suspects, key=lambda q: -suspects[q][1] / suspects[q][0]):
            h, b = suspects[q]
            print(f"  {q}: {b:.3f}s vs clean min {h:.3f}s (x{b / h:.2f}) "
                  "— single-query co-tenancy burst shape; re-read before "
                  "treating as a regression")
    return 1 if regressions or epoch_regressed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
