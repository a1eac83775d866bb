#!/usr/bin/env python3
"""Persist per-query clean-floor history as FLOORS.json (VERDICT r15 #2).

The per-query SUSPECT detection in bench_compare depends on clean-window
artifacts that live in gitignored tmp/ and die with the sandbox; the
canary floors survive (hardcoded) but the per-query floors do not. This
tool parses certified-clean Bench stdout windows and writes FLOORS.json
at the repo root — query -> clean minimum across windows — so the floors
are durable in git and bench_compare (and Bench itself, for in-session
retry) can load them by default.

Usage:
  python3 tools/make_floors.py clean1.out [clean2.out ...]

A window is rejected (skipped, with a warning) when its artifact records
failures/abort or any canary reads >= 2x its hardcoded floor — a
contaminated window must not define a clean floor. Windows that pass are
merged by per-query MIN (heat only ever raises readings, so min across
clean windows is the noise-robust floor estimate). Existing FLOORS.json
floors are folded in with the same min rule unless --fresh is given, so
refreshing with one new window never LOSES a better historical floor.
"""
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
import importlib.util
spec = importlib.util.spec_from_file_location(
    "bench_compare", os.path.join(HERE, "bench_compare.py"))
bc = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bc)

OUT = os.path.join(HERE, "..", "FLOORS.json")


def main(argv):
    fresh = "--fresh" in argv
    paths = [a for a in argv if not a.startswith("--")]
    if not paths:
        print(__doc__)
        return 64
    floors = {}
    windows = []
    if not fresh and os.path.exists(OUT):
        prev = json.load(open(OUT))
        floors.update(prev.get("floors", {}))
        windows = prev.get("windows", [])
        print(f"[floors] folding into existing FLOORS.json "
              f"({len(floors)} floors from {len(windows)} windows)")
    used = 0
    for p in paths:
        mins, _t, cans, _n, bad, _x = bc.parse_side(p)
        hot = [q for q, _k, fl in bc.CANARIES if cans.get(q, 0) >= 2 * fl]
        if bad or hot:
            why = bad or f"hot canary {', '.join(hot)}"
            print(f"[floors] {p}: SKIPPED ({why}) — a contaminated "
                  "window must not define a clean floor")
            continue
        if not mins:
            print(f"[floors] {p}: SKIPPED (no per-query mins parsed)")
            continue
        used += 1
        wid = os.path.basename(p)
        if wid not in windows:
            windows.append(wid)
        for q, v in mins.items():
            floors[q] = round(min(floors.get(q, v), v), 3)
        print(f"[floors] {p}: {len(mins)} query mins folded "
              f"(canaries {', '.join(f'{q}={cans[q]:.3f}' for q in sorted(cans))})")
    if used == 0 and fresh:
        print("[floors] no usable windows — FLOORS.json not written")
        return 1
    out = {
        "_comment": ("Per-query clean-floor minima across certified-clean "
                     "bench windows at sf0.1 (tools/make_floors.py). "
                     "Consumed by tools/bench_compare.py (default SUSPECT "
                     "detection) and graft.Bench (in-session >=2x-floor "
                     "retry). Refresh at each certified-clean window."),
        "windows": windows,
        "floors": dict(sorted(floors.items())),
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"[floors] wrote {os.path.normpath(OUT)}: {len(floors)} floors "
          f"from {len(windows)} window(s)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
