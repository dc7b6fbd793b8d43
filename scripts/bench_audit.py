#!/usr/bin/env python3
"""Per-query WALL-TIME regression gate — the fourth audit axis.

PlanAudit pins plan structure, ShuffleAudit pins shuffle bytes, and
StreamAudit pins replay structure — all blind by construction to
interpreted-evaluation cost (r10 shipped a 1.8x single-gate regression
through a green close because the plan SHAPE never changed). This tool
diffs a fresh graft.Bench artifact per-query against the committed
baseline and FAILS on attributable regressions.

Usage:
  python3 scripts/bench_audit.py [bench_out.json]            # audit
  python3 scripts/bench_audit.py --record [bench_out.json]   # rebase

Baseline: bench_baseline_sf0.1.json (committed; per-query min-of-reps
seconds plus the calib context it was recorded under).

Gate rule (the ShuffleAudit shape): FAIL when
    cur > base * (1 + REL) + ABS          (REL=0.25, ABS=0.3 s)
so sub-second scheduler noise can never trip it, while a multi-second
or >25% shift on a real query does.

Attribution rule (SURVEY §8 box-churn discipline), applied BEFORE
failing — a regression is only code-attributable on a healthy box:
  * calib dirty (calib_pre or calib_post > 1.5x the 0.22 s clean
    constant on the 32-thread reference): machine, not code -> every
    breach downgrades to a WARNING and the exit code stays 0. Re-run
    on an idle box before believing either verdict.
  * uniform inflation (>= 40% of shared queries above the noise floor
    in the SAME direction): co-tenant load or thermal state inflates
    the whole suite at once; single-query code regressions do not ->
    downgrade to warnings.
Recording refuses a dirty-calib artifact (--force overrides) so the
baseline itself is always an idle-box measurement.
"""
import json
import os
import sys

REL = 0.25
ABS = 0.30
CALIB_CLEAN = 0.22
CALIB_DIRTY_FACTOR = 1.5
UNIFORM_FRACTION = 0.40
BASELINE = os.path.join(os.path.dirname(__file__), "..",
                        "bench_baseline_sf0.1.json")


# ONE loader for bench artifacts (min-of-reps + driver-wrapper salvage)
# shared with the round-over-round diff tool — the r11 review found the
# same empty-reps bug fixed twice in two copies of it
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_diff import load as load_bench  # noqa: E402


def calib_state(d):
    pre = d.get("calib_pre_sec")
    post = d.get("calib_post_sec")
    clean = d.get("calib_clean_sec", CALIB_CLEAN)
    worst = max(x for x in (pre, post, 0.0) if x is not None)
    dirty = worst > clean * CALIB_DIRTY_FACTOR
    return pre, post, dirty


def main():
    argv = sys.argv[1:]
    record = "--record" in argv
    force = "--force" in argv
    paths = [a for a in argv if not a.startswith("--")]
    bench_path = paths[0] if paths else "bench_out.json"

    d, cur = load_bench(bench_path)
    pre, post, dirty = calib_state(d)
    print(f"[bench-audit] artifact={bench_path} queries={len(cur)} "
          f"calib={pre}/{post} dirty={dirty}")

    if record:
        if dirty and not force:
            print("[bench-audit] REFUSING to record a dirty-calib artifact "
                  "(calib > 1.5x clean); rerun Bench on an idle box or pass "
                  "--force")
            sys.exit(2)
        base = {
            "sf": d.get("sf"),
            "calib_pre_sec": pre,
            "calib_post_sec": post,
            "queries": {k: round(v, 4) for k, v in sorted(cur.items())},
        }
        with open(BASELINE, "w") as f:
            json.dump(base, f, indent=1, sort_keys=True)
        print(f"[bench-audit] recorded {len(cur)} baselines -> {BASELINE}")
        return

    if not os.path.exists(BASELINE):
        print("[bench-audit] no baseline committed yet — run with --record")
        sys.exit(2)
    with open(BASELINE) as f:
        base = json.load(f)
    bq = base["queries"]

    # cross-SF artifacts are not comparable — refuse, don't "improve"
    if base.get("sf") and d.get("sf") and base["sf"] != d["sf"]:
        print(f"[bench-audit] FAIL: artifact sf={d['sf']} does not match "
              f"baseline sf={base['sf']} — wrong artifact or baseline")
        sys.exit(2)

    shared = sorted(set(bq) & set(cur))
    added = sorted(set(cur) - set(bq))
    gone = sorted(set(bq) - set(cur))

    breaches = [(n, bq[n], cur[n]) for n in shared
                if cur[n] > bq[n] * (1 + REL) + ABS]
    # uniform-inflation detector: count noise-floor-exceeding moves by
    # direction over ALL shared queries (not just gate breaches)
    up = sum(1 for n in shared if cur[n] - bq[n] > max(0.10 * bq[n], 0.05))
    uniform = shared and up / len(shared) >= UNIFORM_FRACTION

    improved = [(n, bq[n], cur[n]) for n in shared
                if bq[n] > cur[n] * (1 + REL) + ABS]

    for n, b, c in sorted(breaches, key=lambda r: -(r[2] - r[1])):
        print(f"  REGRESSED {n:36s} {b:7.2f} -> {c:7.2f}  ({c - b:+.2f} s)")
    for n, b, c in sorted(improved, key=lambda r: r[2] - r[1]):
        print(f"  improved  {n:36s} {b:7.2f} -> {c:7.2f}  ({c - b:+.2f} s)")
    if added:
        print(f"  new (no baseline, record to pin): {', '.join(added)}")
    if gone:
        print(f"  missing vs baseline: {', '.join(gone)}")

    # a query MISSING from the artifact is the worst regression there is
    # (it crashed or the run died partway) — never a green exit; no
    # box-churn attribution applies (churn slows queries, it does not
    # delete them)
    if gone:
        print(f"[bench-audit] FAIL: {len(gone)} baseline query(ies) absent "
              "from the artifact — incomplete run or crashing query")
        sys.exit(1)
    if breaches:
        if dirty:
            print(f"[bench-audit] {len(breaches)} breach(es) but calib is "
                  f"DIRTY ({pre}/{post} vs {CALIB_CLEAN} clean) — machine-"
                  "attributed, WARN only. Re-run on an idle box.")
            sys.exit(0)
        if uniform:
            print(f"[bench-audit] {len(breaches)} breach(es) but inflation "
                  f"is UNIFORM ({up}/{len(shared)} queries up) — machine-"
                  "attributed, WARN only. Re-run on an idle box.")
            sys.exit(0)
        print(f"[bench-audit] FAIL: {len(breaches)} code-attributable "
              f"regression(s) (calib clean, inflation not uniform)")
        sys.exit(1)
    print(f"[bench-audit] OK: {len(shared)} queries within "
          f"+{REL:.0%}+{ABS}s of baseline"
          + (f"; {len(improved)} improved (consider --record)"
             if improved else ""))


if __name__ == "__main__":
    main()
