#!/usr/bin/env python
"""Dispersion-aware round-over-round bench comparison (r5, VERDICT #8).

Diffs two bench result files and classifies every shared numeric metric
change as improvement / regression / noise, using the
``*_window_spread`` dispersion fields bench.py emits (r5) as the noise
band.  Rounds 3->4 showed 2-3x swings on family metrics that were pure
tunnel contention (hessian_vs_baseline 159->112, prune_vs_baseline
534->176); this makes that call mechanical instead of re-litigating it
by hand each round.

Usage:
    python tools/bench_compare.py BENCH_r04.json BENCH_r05.json
    python tools/bench_compare.py old.json new.json --all   # incl. noise

Caveat: the in-window spread is a LOWER bound on true dispersion --
cross-window contention can exceed it 2-3x on sub-30 ms metrics (the
table-path prune/diff3d numbers swing that much between same-code runs
an hour apart).  Treat a "REGRESSION" on those as suspect unless the
underlying code changed.

Accepts either a raw bench.py JSON line or the driver's wrapper format
({"n": ..., "cmd": ..., "rc": ..., "tail": "<stdout tail>"}); clipped
tails are salvaged by regex-extracting "key": number pairs from the
fragment (the r3/r4 driver artifacts lost their leading keys).
"""

import json
import re
import sys

#: suffixes where a LARGER value is better
_HIGHER = ("_per_sec", "_vs_baseline", "_vs_planner", "_tflops", "_gbps",
           "_frac", "_accuracy", "value")
#: suffixes where a SMALLER value is better
_LOWER = ("_seconds", "_parity", "_err_ms", "_spread")
#: purely descriptive keys: never classified
_INFO = ("natoms", "npulse", "nstate", "_ntr", "_nvars", "_nvox",
         "_rank", "_nsig", "_capacity", "_kernel", "n", "rc",
         "_ref_per_atom_vs_64", "_warmup_seconds", "_compress_seconds",
         "wall_seconds")

#: minimum noise band when no window_spread is available: tunnel
#: contention alone swings in-window bests by ~±30-40%
#: (docs/performance.md "Benchmarking honestly")
_MIN_BAND = 1.4


def load(path):
    """Metric dict from a bench JSON line or a driver wrapper file."""
    with open(path) as fh:
        text = fh.read()
    try:
        obj = json.loads(text)
        if isinstance(obj, dict) and "tail" in obj and "metric" not in obj:
            text = obj["tail"]
            obj = None
    except json.JSONDecodeError:
        obj = None
    if obj is None:
        try:
            obj = json.loads(text[text.index("{"):])
        except (ValueError, json.JSONDecodeError):
            # clipped fragment: salvage flat "key": number pairs
            obj = {}
            for m in re.finditer(
                    r'"([A-Za-z0-9_]+)":\s*(-?\d+(?:\.\d+)?(?:e-?\d+)?)',
                    text):
                obj[m.group(1)] = float(m.group(2))
    # the r5 tail-robust nested headline duplicates the north-star keys;
    # fold it back so clipped files still compare the headline
    head = obj.pop("headline", None)
    if isinstance(head, dict):
        for k, v in head.items():
            obj.setdefault(k, v)
    return {k: v for k, v in obj.items() if isinstance(v, (int, float))
            and not isinstance(v, bool)}


def direction(key):
    for s in _INFO:
        if key.endswith(s) or key == s.lstrip("_"):
            return None
    for s in _LOWER:
        if key.endswith(s):
            return -1
    for s in _HIGHER:
        if key.endswith(s):
            return +1
    return None


def spread_for(key, *dicts):
    """Largest window_spread associated with `key` across both rounds."""
    # foo_atoms_per_sec / foo_best_seconds / foo_vs_baseline ->
    # foo_window_spread; try progressively shorter prefixes
    parts = key.split("_")
    best = 1.0
    for n in range(len(parts), 0, -1):
        cand = "_".join(parts[:n]) + "_window_spread"
        vals = [d.get(cand) for d in dicts if d.get(cand)]
        if vals:
            best = max(vals)
            break
    return max(best, _MIN_BAND)


def compare(old, new):
    rows = []
    for key in sorted(set(old) & set(new)):
        sgn = direction(key)
        if sgn is None or key.endswith("_window_spread"):
            continue
        a, b = float(old[key]), float(new[key])
        if a == 0 or b == 0:
            continue
        ratio = b / a
        band = spread_for(key, old, new)
        gain = ratio ** sgn          # >1 means better either way
        if gain > band:
            cls = "improvement"
        elif gain < 1.0 / band:
            cls = "REGRESSION"
        else:
            cls = "noise"
        rows.append((key, a, b, ratio, band, cls))
    return rows


def main(argv):
    args = [a for a in argv if not a.startswith("--")]
    show_all = "--all" in argv
    if len(args) != 2:
        print(__doc__)
        return 2
    old, new = load(args[0]), load(args[1])
    rows = compare(old, new)
    if not rows:
        print("no shared numeric metrics found")
        return 1
    width = max(len(r[0]) for r in rows)
    counts = {"improvement": 0, "REGRESSION": 0, "noise": 0}
    for key, a, b, ratio, band, cls in rows:
        counts[cls] += 1
        if cls == "noise" and not show_all:
            continue
        print(f"{key:<{width}}  {a:>12.4g} -> {b:>12.4g}  "
              f"x{ratio:<6.2f} band x{band:<4.2f}  {cls}")
    print(f"\n{counts['improvement']} improvements, "
          f"{counts['REGRESSION']} regressions, "
          f"{counts['noise']} within the noise band"
          + ("" if show_all else " (use --all to list)"))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
