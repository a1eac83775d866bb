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

Canaries: TWO fixed queries whose mins only move with machine conditions,
never query code. kv_scan_count is a pure-count scan (CPU / page-cache
co-tenancy; clean floor ~0.25s at sf0.1); kv_shuffle_canary is a fixed
join+agg through a real exchange (shuffle-side contention — round 11's
graded window inflated shuffle-heavy queries 1.2-1.8x while the scan
canary sat at its floor; clean floor ~0.45s at sf0.1). A side reading
EITHER canary >= 2x its floor is CONTAMINATED and the tool REFUSES to
print a delta table — cross-window deltas off such a side are
manufactured noise, not measurements.

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

Exit codes: 0 clean, 1 regressions found, 2 canary contaminated (trumps
1; no delta table printed), 3 refused (failed/aborted/poisoned side —
nothing was compared).
"""
import json
import re
import sys

# (query name, compact-line key, clean floor sec at sf0.1) — >=2x floor
# => contaminated. Floors recorded in PLANS.md (bench canary doctrine).
CANARIES = [
    ("kv_scan_count", "canary_kv_scan_count", 0.30),
    ("kv_shuffle_canary", "canary_kv_shuffle", 0.55),
]
CANARY_POISON_CEILING = 0.05  # below this = queries threw, not ran (r9)

SPREAD_RE = re.compile(r'"([A-Za-z0-9_]+)":\[([0-9.]+),([0-9.]+),([0-9.]+)\]')
COMPACT_RE = re.compile(r'"([A-Za-z0-9_]+)":([0-9.]+)')
NON_QUERY_KEYS = ({"value", "qsum", "failed_n", "n",
                   "rc", "cpus", "sf", "iters", "nq"} |
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
           canaries: {query: min_sec}, n_spread: int, bad: str|None) for
    one artifact; `bad` is a human-readable reason the side is not a
    measurement set."""
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
    return mins, total, canaries, n_spread, bad


def main(argv):
    args = [a for a in argv if not a.startswith("--")]
    opts = dict(a.lstrip("-").split("=", 1) if "=" in a else (a.lstrip("-"), True)
                for a in argv if a.startswith("--"))
    # also accept "--abs 0.2" style
    flat = []
    it = iter(argv)
    for a in it:
        if a in ("--abs", "--rel", "--history"):
            opts[a.lstrip("-")] = next(it, None)
        elif not a.startswith("--"):
            flat.append(a)
    if len(flat) != 2:
        print(__doc__)
        return 64
    abs_floor = float(opts.get("abs", 0.15))
    rel_floor = float(opts.get("rel", 1.3))
    old_path, new_path = flat
    old, old_total, old_canaries, old_ns, old_bad = parse_side(old_path)
    new, new_total, new_canaries, new_ns, new_bad = parse_side(new_path)

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

    # ambient cross-window factor (VERDICT r13 #3): both windows passed the
    # 2x-floor gate, but they may sit at different ambient bands; the canary
    # ratio measures the band shift with a query whose code never changes
    ambient, amb_src = 1.0, None
    for qname in ("kv_shuffle_canary", "kv_scan_count"):
        a_c, b_c = old_canaries.get(qname), new_canaries.get(qname)
        if a_c and b_c and a_c > CANARY_POISON_CEILING:
            ambient, amb_src = b_c / a_c, qname
            break
    if ambient > 1.15 or ambient < 1 / 1.15:
        note = (" — beyond x1.3 total-level comparison is not meaningful; "
                "read the clean-window history instead"
                if ambient > 1.3 or ambient < 1 / 1.3 else "")
        print(f"[ambient] {amb_src} NEW/OLD = x{ambient:.2f} — the windows "
              "ran at different ambient bands; NEW readings are "
              f"canary-normalized before the regression gates{note}")
    else:
        ambient = 1.0

    # per-query clean-history floors (VERDICT r12 #2): minimum across the
    # persisted clean windows, used to flag single-query co-tenancy bursts
    # that the window-level canaries cannot see
    hist = {}
    hist_n = 0
    hval = opts.get("history")
    if hval and hval is not True:
        import glob as _glob
        paths = []
        for frag in str(hval).split(","):
            frag = frag.strip()
            if frag:
                paths.extend(sorted(_glob.glob(frag)) or [frag])
        for p in paths:
            try:
                mins, _t, cans, _n, bad = parse_side(p)
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

    if old_total is not None and new_total is not None:
        norm_col = (f" (normalized: {new_total / ambient:.1f}s)"
                    if ambient != 1.0 else "")
        print(f"[total] {old_total:.1f}s -> {new_total:.1f}s "
              f"({new_total - old_total:+.1f}s){norm_col}")
    common = sorted(set(old) & set(new))
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
        bn = b / ambient  # normalized NEW reading (== b when ambient off)
        if trips(a, bn):
            (regressions if bn > a else improvements).append((bn - a, q, a, b, bn))
        elif trips(a, b):
            # raw delta exists but the window's own canary shift accounts
            # for it — weather wearing the query's name, not a regression
            explained.append((b - a, q, a, b, bn))
    for title, rows in (("REGRESSIONS", sorted(regressions, reverse=True)),
                        ("improvements", sorted(improvements))):
        if rows:
            print(f"-- {title} (|delta| > {abs_floor}s and ratio > {rel_floor}x"
                  + (", canary-normalized" if ambient != 1.0 else "") + ")")
            for d, q, a, b, bn in rows:
                tag = " [SUSPECT — see below]" if q in suspects else ""
                ncol = f" (normalized {bn:.3f}s, x{bn / a:.2f})" \
                    if ambient != 1.0 else ""
                print(f"  {q}: {a:.3f}s -> {b:.3f}s ({d:+.3f}s, "
                      f"x{b / a:.2f}){ncol}{tag}")
    if explained:
        print(f"-- ambient-explained (raw delta within the x{ambient:.2f} "
              "canary band once normalized — co-tenancy, not code)")
        for d, q, a, b, bn in sorted(explained, reverse=True):
            print(f"  {q}: {a:.3f}s -> {b:.3f}s raw (x{b / a:.2f}), "
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
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
