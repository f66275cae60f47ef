#!/usr/bin/env python3
"""Per-query bench attribution: diff two Bench full-detail JSON files.

Usage: python3 tools/bench_diff.py OLD.json NEW.json [ratio_threshold]

Reads the {"queries": {name: seconds|"error"}} map each Bench run writes to
$SPARK_GRAFT_BENCH_OUT (default /tmp/graft_bench.json) and reports totals,
added/removed queries, and the regressions/improvements past the threshold
(default 2.0x, ignoring sub-0.15 s noise). With Bench clearing the cache
between queries (round 5), these deltas are attributable to the query
itself, not to cache warm order.
"""
import json
import sys

try:  # behave under `| head`: die silently on a closed pipe
    import signal
    signal.signal(signal.SIGPIPE, signal.SIG_DFL)
except (ImportError, AttributeError, ValueError):
    pass


def load(path):
    with open(path) as f:
        data = json.load(f)
    # the driver's BENCH_r*.json wraps the metric object under "parsed"
    if "parsed" in data and isinstance(data["parsed"], dict):
        data = data["parsed"]
    qs = {}
    for name, value in data.get("queries", {}).items():
        if name == "_others":  # compact-line rollup, not a query
            continue
        qs[name] = None if value == "error" else float(value)
    return data, qs


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old_path, new_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    floor = 0.15  # ignore deltas inside scheduler-noise territory

    old_data, old_qs = load(old_path)
    new_data, new_qs = load(new_path)

    def total(data, qs):
        v = data.get("value")
        return float(v) if v is not None else sum(x or 0.0 for x in qs.values())

    print(f"total: {total(old_data, old_qs):.2f}s ({len(old_qs)} queries) -> "
          f"{total(new_data, new_qs):.2f}s ({len(new_qs)} queries)")

    added = sorted(set(new_qs) - set(old_qs))
    removed = sorted(set(old_qs) - set(new_qs))
    if added:
        cost = sum(new_qs[q] or 0.0 for q in added)
        print(f"added ({len(added)}, {cost:.2f}s): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")

    errs = [q for q, v in new_qs.items() if v is None]
    if errs:
        print(f"ERRORS in new run: {', '.join(sorted(errs))}")

    deltas = []
    for q in set(old_qs) & set(new_qs):
        o, n = old_qs[q], new_qs[q]
        if o is None or n is None or (o < floor and n < floor):
            continue
        # clamp both sides away from zero so ratios stay finite in BOTH
        # directions (a 0.0 would otherwise divide-by-zero in the report)
        ratio = max(n, 1e-9) / max(o, 1e-9)
        deltas.append((ratio, q, o, n))

    regressions = sorted((d for d in deltas if d[0] >= threshold), reverse=True)
    improvements = sorted(d for d in deltas if d[0] <= 1.0 / threshold)
    if regressions:
        print(f"\nregressions >= {threshold}x:")
        for ratio, q, o, n in regressions:
            print(f"  {q}: {o:.3f}s -> {n:.3f}s ({ratio:.1f}x)")
    else:
        print(f"\nno regressions >= {threshold}x")
    if improvements:
        print(f"\nimprovements >= {threshold}x:")
        for ratio, q, o, n in improvements:
            print(f"  {q}: {o:.3f}s -> {n:.3f}s ({1 / ratio:.1f}x faster)")
    return 1 if (regressions or errs) else 0


if __name__ == "__main__":
    sys.exit(main())
