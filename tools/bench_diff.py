#!/usr/bin/env python3
"""Compare two Bench JSON artifacts on their SHARED keys.

Usage: python3 tools/bench_diff.py <old.json> <new.json> [top_n]

Reads the driver's BENCH_r{N}.json (or a raw `runMain graft.Bench`
capture — `[info] ` prefixes are stripped), joins the per-query maps
on shared keys, and prints the shared-key totals, the ratio
(new/old), and the largest per-key regressions/improvements. This is
the judge's cross-round metric: totals alone mislead when the key
count grows, so only shared keys are compared.
"""
import re, sys


def load(path):
    """Tolerant loader: the driver's BENCH_r{N}.json wraps a (possibly
    head-TRUNCATED) bench line in a "tail" field, while local captures
    are raw `[info] {...}` lines — so parse by regex over the whole
    file: every "q_<name>": <number> pair is a per-key seconds entry
    (later occurrences win). Failures are recorded as negated seconds
    and excluded.
    """
    text = open(path).read()
    pairs = re.findall(r'\\?"(q_\w+)\\?":(-?\d+(?:\.\d+)?(?:[eE]-?\d+)?)', text)
    d = {k: float(v) for k, v in pairs}
    if not d:
        raise SystemExit(f"no q_* timings found in {path}")
    return {k: v for k, v in d.items() if v >= 0}


def main():
    old_path, new_path = sys.argv[1], sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    old, new = load(old_path), load(new_path)
    shared = sorted(set(old) & set(new))
    if not shared:
        raise SystemExit("no shared keys")
    t_old = sum(old[k] for k in shared)
    t_new = sum(new[k] for k in shared)
    print(f"shared keys: {len(shared)} (old has {len(old)}, new has {len(new)})")
    print(f"shared-key totals: old {t_old:.1f}s  new {t_new:.1f}s  "
          f"ratio {t_new / t_old:.2f}x")
    diffs = sorted(shared, key=lambda k: new[k] - old[k])
    print(f"top {top_n} regressions (new - old seconds):")
    for k in reversed(diffs[-top_n:]):
        print(f"  {k}: {old[k]:.2f} -> {new[k]:.2f} (+{new[k] - old[k]:.2f})")
    print(f"top {top_n} improvements:")
    for k in diffs[:top_n]:
        print(f"  {k}: {old[k]:.2f} -> {new[k]:.2f} ({new[k] - old[k]:.2f})")
    slow = [k for k in shared if old[k] > 0.5 and new[k] / old[k] > 2.0]
    print(f"shared keys regressed >2x (driver bar): {slow or 'none'}")


if __name__ == "__main__":
    main()
