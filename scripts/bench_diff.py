#!/usr/bin/env python3
"""Round-over-round bench comparison: the analysis every round ledger
does by hand, as a tool.

Usage: bench_diff.py OLD.json NEW.json [--rel 0.20] [--abs 0.30]

Inputs are graft.Bench artifacts (bench_out.json / BENCH_r*.json). Per
query the compared value is the MIN over reps_sec when present (the
clean-JVM minimum the ledgers trust), else the queries value. A shift
is flagged only when BOTH the relative change exceeds --rel AND the
absolute change exceeds --abs — sub-second scheduler noise stays out
of the report by construction. Exit code is 0 either way: this is an
attribution aid, not a gate (PlanAudit/ShuffleAudit gate structure and
volume; timing shifts on a shared box need a human read, see the
SURVEY §8 box-churn discipline).
"""
import json
import re
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    # Driver BENCH_r*.json wrapper: {n, rc, cpus, sf, tail, parsed} with
    # `parsed` carrying the full object when the line survived capture,
    # and `tail` a truncated suffix when it did not — salvage whatever
    # complete "name":[reps] pairs the tail still holds.
    if "tail" in d and "queries" not in d:
        if d.get("parsed"):
            d = d["parsed"]
        else:
            tail = d.get("tail") or ""
            # the r15 sentinel fields also match the "name":[reps]
            # shape — a truncated tail must not salvage a stream gate's
            # [io_pre, io_post, sched_pre, sched_post] bracket (or the
            # decile array) as that gate's rep times. Strip them first;
            # [^}]*/[^\]]* with an optional closer also swallows an
            # object the truncation cut mid-way through.
            tail = re.sub(r'"gate_sentinels":\{[^}]*\}?', '', tail)
            tail = re.sub(r'"calib_decile_sec":\[[^\]]*\]?', '', tail)
            pairs = re.findall(r'"([a-z0-9_]+)":\[([0-9.,eE+-]+)\]',
                               tail)
            d = dict(d, reps_sec={n: [float(x) for x in v.split(",")]
                                  for n, v in pairs})
    # union of both maps: a tail-truncated capture can carry reps_sec
    # entries without a queries map
    reps = d.get("reps_sec") or {}
    qs = d.get("queries") or {}
    out = {}
    for name in set(reps) | set(qs):
        r = reps.get(name)
        # a tail-salvaged reps entry can be EMPTY with no queries twin —
        # skip names with neither a non-empty reps list nor a value
        if r:
            out[name] = min(r)
        elif name in qs:
            out[name] = qs[name]
    return d, out


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(zip(sys.argv[1:], sys.argv[2:]))
    rel = float(opts.get("--rel", 0.20))
    abs_floor = float(opts.get("--abs", 0.30))
    (dold, old), (dnew, new) = load(args[0]), load(args[1])

    both = sorted(set(old) & set(new))
    gone, added = sorted(set(old) - set(new)), sorted(set(new) - set(old))
    up, down = [], []
    for n in both:
        delta = new[n] - old[n]
        if abs(delta) > abs_floor and abs(delta) > rel * old[n]:
            (up if delta > 0 else down).append((n, old[n], new[n]))

    def show(title, rows):
        if rows:
            print(f"{title} ({len(rows)}):")
            for n, o, v in sorted(rows, key=lambda r: -(abs(r[2] - r[1]))):
                print(f"  {n:36s} {o:7.2f} -> {v:7.2f}  ({v - o:+.2f} s)")

    for tag, d in (("old", dold), ("new", dnew)):
        print(f"{tag}: sf={d.get('sf')} queries={len(d.get('queries') or {})}"
              f" batch={d.get('batch_sec', float('nan')):.1f}"
              f" stream={d.get('streaming_sec', float('nan')):.1f}"
              f" calib={d.get('calib_pre_sec', float('nan')):.2f}/"
              f"{d.get('calib_post_sec', float('nan')):.2f}")
    so, sn = sum(old[n] for n in both), sum(new[n] for n in both)
    print(f"overlap: {len(both)} queries, sum {so:.1f} -> {sn:.1f} s"
          f" ({sn - so:+.1f})")
    show("slower", up)
    show("faster", down)
    def names(tag, xs):
        if xs:
            head = ", ".join(xs[:12]) + (", …" if len(xs) > 12 else "")
            print(f"{tag} ({len(xs)}): {head}")
    names("added", added)
    names("removed", gone)
    if not (up or down):
        print(f"no shifts beyond ±{rel:.0%} and ±{abs_floor}s — flat round")


if __name__ == "__main__":
    main()
