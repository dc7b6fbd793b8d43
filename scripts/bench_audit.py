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
  options: --baseline PATH  --rel R --abs A (stored on --record)
           --accept-uniform (downgrade a uniform+clean-calib fail)
           --force (record despite dirty calib)
           --replace (record may RAISE existing pins; default keeps
                      per-query min(old pin, new value) — ADVICE r14:
                      one clean run must not loosen 55 gates at once)

Baselines are PER-SF (committed): bench_baseline_sf0.1.json for the
full driver-SF suite, bench_baseline_sf1.json for the staged-sf1 heavy
subset (graft.BenchSubset artifact). The baseline is picked from the
artifact's own sf field, so auditing a sf1 artifact against the sf0.1
baseline is impossible by construction; --baseline overrides. Each
baseline carries its own headroom (rel/abs) because the noise regime
differs: sf0.1 is scheduler noise (+25%+0.3 s), sf1 is 48g GC churn
(wider, recorded from the measured rep band).

Gate rule (the ShuffleAudit shape): FAIL when
    cur > base * (1 + REL) + ABS
so sub-second scheduler noise can never trip it, while a multi-second
or >25% shift on a real query does.

Attribution rule (SURVEY §8 box-churn discipline), applied BEFORE
failing — a regression is only code-attributable on a healthy box:
  * calib fields ABSENT entirely: the artifact is UNINSTRUMENTED — it
    can neither certify health nor attribute a breach, and it must
    never become the committed baseline. Audit exits 2; --record
    refuses (no --force escape: an idle-box baseline NEEDS the
    sentinel evidence by definition).
  * calib dirty (calib_pre or calib_post > 1.5x the 0.22 s clean
    constant on the 32-thread reference): machine, not code -> every
    breach downgrades to a WARNING and the exit code stays 0. Re-run
    on an idle box before believing either verdict.
  * calib ELEVATED but under the dirty bar (r13: a host running a
    measured 24% slow sat at 0.27 — "clean" by the binary test — and
    uniformly inflated the suite): the gate scales each query's
    allowance by the sentinel's own elevation, cur > base*(1+rel)*
    (worst_calib/clean) + abs, when worst_calib/clean > 1.15. The
    sentinel is code-independent, so its elevation is genuinely
    machine; a real code regression still breaches because it stacks
    ON TOP of the box factor. The uniform+clean shared-kernel
    detector is untouched — a kernel regression inflates queries but
    NOT the sentinel, so scale stays 1.0 there.
  * uniform inflation (>= 40% of shared queries above the noise floor
    in the SAME direction) with calib ALSO dirty: co-tenant load or
    thermal state inflates the whole suite at once -> warnings.
    With calib CLEAN, uniform inflation is NOT machine-attributable —
    a clean sentinel contradicts the co-tenant-load explanation, and a
    slowdown in a shared kernel (tokenizer, md5) inflates the suite
    exactly this way (the r10 blind-spot class) -> FAIL unless the
    operator passes an explicit --accept-uniform.
  * I/O sentinel (r13): the CPU spin is blind to host STORAGE
    contention — the r13 close measured calib +15% while the
    fsync-heavy streaming floor inflated +40%, proven box-not-code by
    a same-box cross-version run. Artifacts now carry
    calib_io_pre/post_sec (Bench.calibrateIo: 24 small durable
    writes, the streaming-checkpoint shape), and a recorded baseline
    stores its own io pair, so io-dirtiness is SELF-ANCHORED: when a
    uniform+cpu-clean fail would fire but the artifact's worst io
    calib exceeds 1.5x the baseline's recorded worst, the breach is
    machine-attributed (io-dirty) and downgrades to WARN. Baselines
    recorded before r13 carry no io pair — the branch stays dormant
    for them (conservative: the FAIL still demands a human).
  * streaming-floor graded band (r14): a third sentinel,
    calib_sched_pre/post_sec (Bench.calibrateSched: 24 trivial
    single-partition jobs — the DAGScheduler round trip every
    micro-batch pays), rides next to the io pair. For stream_* queries
    ONLY, the allowance scales by the WORST self-anchored floor
    elevation, max over {io, sched} of min(cur_pair)/max(base_pair)
    when > 1.15, capped at 2.0 (the both-samples 2x io-dirty escape
    owns anything beyond). Batch queries never get the floor band —
    their cost is not floor-shaped, and loosening them would hide real
    kernel regressions behind storage noise. A real streaming code
    regression still breaches: it stacks ON TOP of the floor factor,
    same argument as the CPU band.
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
REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


# ONE loader for bench artifacts (min-of-reps + driver-wrapper salvage)
# shared with the round-over-round diff tool — the r11 review found the
# same empty-reps bug fixed twice in two copies of it
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_diff import load as load_bench  # noqa: E402


def calib_state(d):
    """-> (pre, post, worst, dirty) where dirty is None when the
    artifact has NO calib fields at all (uninstrumented — distinct from
    clean!); worst is None in that same branch so the caller's 4-way
    unpack never crashes on an uninstrumented artifact (ADVICE r13:
    the old 3-tuple here turned the documented exit-2 path into a
    ValueError traceback). worst folds in the MID-SUITE decile probes
    (calib_decile_sec, r15): a co-tenant burst that starts after
    calib_pre and dies before calib_post used to be invisible to both
    suite-level samples — now it elevates worst, so the graded band /
    dirty attribution see it in the artifact's own evidence."""
    pre = d.get("calib_pre_sec")
    post = d.get("calib_post_sec")
    if pre is None and post is None:
        return None, None, None, None
    clean = d.get("calib_clean_sec", CALIB_CLEAN)
    deciles = [x for x in d.get("calib_decile_sec", []) if x is not None]
    worst = max(x for x in [pre, post, 0.0, *deciles] if x is not None)
    dirty = worst > clean * CALIB_DIRTY_FACTOR
    return pre, post, worst, dirty


def sentinel_pair(d, prefix):
    """An artifact's floor-sentinel samples for `prefix` ('calib_io' or
    'calib_sched'; negatives = the salvage value for an unavailable
    measurement — dropped), or [] when the artifact predates that
    sentinel."""
    vals = [d.get(f"{prefix}_pre_sec"), d.get(f"{prefix}_post_sec")]
    return [v for v in vals if v is not None and v >= 0]


def io_pair(d):
    return sentinel_pair(d, "calib_io")


def gate_bracket(d, name):
    """-> (io_pair, sched_pair) from the artifact's per-gate sentinel
    bracket for stream gate `name` (gate_sentinels[name] =
    [io_pre, io_post, sched_pre, sched_post], r15), each pair with
    negative salvage values dropped; ([], []) when the artifact (or
    that gate) predates the bracketing."""
    b = d.get("gate_sentinels", {}).get(name)
    if not b or len(b) != 4:
        return [], []
    io = [v for v in b[:2] if v is not None and v >= 0]
    sched = [v for v in b[2:] if v is not None and v >= 0]
    return io, sched


def floor_scale(cur_pair, base_pair):
    """Self-anchored elevation factor of a floor sentinel (io/sched)
    vs the baseline's own recorded pair: conservative min(cur)/max(base)
    — BOTH current samples must sit above the baseline's worst, the
    same both-samples discipline as the io-dirty escape — applied only
    past the same 1.15 band the CPU sentinel uses, and capped at 2.0
    (beyond that the 2x both-samples io-dirty escape owns attribution,
    not the graded band). 1.0 when either side lacks a recorded pair
    (pre-r14 baselines: the band stays dormant, conservative)."""
    if len(cur_pair) == 2 and base_pair:
        f = min(cur_pair) / max(base_pair)
        if f > 1.15:
            return min(f, 2.0)
    return 1.0


def baseline_path_for(d):
    """Pick the committed per-SF baseline from the artifact's sf field.
    Bench/BenchSubset write sf as the data DIRECTORY ('…/sf0.1',
    'target/sf1'); the driver wrapper rewrites it numeric (0.1)."""
    sf = d.get("sf")
    if isinstance(sf, (int, float)):
        name = f"sf{sf:g}"
    elif isinstance(sf, str) and sf:
        name = os.path.basename(sf.rstrip("/"))
    else:
        name = "sf0.1"
    return os.path.join(REPO, f"bench_baseline_{name}.json")


def opt_value(argv, flag, default=None):
    if flag in argv:
        i = argv.index(flag)
        if i + 1 < len(argv):
            return argv[i + 1]
    return default


def main():
    argv = sys.argv[1:]
    record = "--record" in argv
    force = "--force" in argv
    replace = "--replace" in argv
    accept_uniform = "--accept-uniform" in argv
    baseline_opt = opt_value(argv, "--baseline")
    rel_opt = opt_value(argv, "--rel")
    abs_opt = opt_value(argv, "--abs")
    skip = {baseline_opt, rel_opt, abs_opt}
    paths = [a for a in argv if not a.startswith("--") and a not in skip]
    bench_path = paths[0] if paths else "bench_out.json"

    d, cur = load_bench(bench_path)
    pre, post, worst, dirty = calib_state(d)
    io_cur = io_pair(d)
    sched_cur = sentinel_pair(d, "calib_sched")
    baseline = baseline_opt or baseline_path_for(d)
    print(f"[bench-audit] artifact={bench_path} queries={len(cur)} "
          f"calib={pre}/{post} "
          f"dirty={'UNINSTRUMENTED' if dirty is None else dirty} "
          f"io={'/'.join(f'{v:.3f}' for v in io_cur) if io_cur else 'n/a'} "
          f"sched={'/'.join(f'{v:.3f}' for v in sched_cur) if sched_cur else 'n/a'} "
          f"baseline={os.path.basename(baseline)}")

    if dirty is None:
        if record:
            print("[bench-audit] REFUSING to record an artifact with no "
                  "calib fields — a baseline must carry its own idle-box "
                  "evidence (run graft.Bench / graft.BenchSubset, which "
                  "emit the sentinel)")
            sys.exit(2)
        print("[bench-audit] FAIL: artifact carries no calib sentinel — "
              "it can neither certify box health nor attribute a breach; "
              "re-run graft.Bench (the sentinel is built in)")
        sys.exit(2)

    if record:
        clean_ref = d.get("calib_clean_sec", CALIB_CLEAN)
        if dirty and not force:
            print("[bench-audit] REFUSING to record a dirty-calib artifact "
                  "(calib > 1.5x clean); rerun Bench on an idle box or pass "
                  "--force")
            sys.exit(2)
        if worst > clean_ref * 1.15 and not force:
            # the graded-band rule applied to the RECORD side of the same
            # invariant: an elevated-band box pins every value 15-50% high,
            # silently loosening the gate for every future audit
            print(f"[bench-audit] REFUSING to record an elevated-box "
                  f"artifact (calib {worst:.3f} = {worst / clean_ref:.2f}x "
                  "clean > 1.15x); rerun on an idle box or pass --force")
            sys.exit(2)
        # Downward-only discipline (ADVICE r14): recording over an
        # existing baseline keeps per-query min(old pin, new value) —
        # ONE clean run must never RAISE pins wholesale (e8c8135 raised
        # 55 of 150 by 5-61% from a single run, loosening the gate by
        # up to ~60% on top of the rel headroom). A pin may only rise
        # under an explicit --replace, which prints the raises it makes
        # so the ledger can record why.
        pinned = {k: round(v, 4) for k, v in sorted(cur.items())}
        if os.path.exists(baseline) and not replace:
            with open(baseline) as f:
                old_q = json.load(f).get("queries", {})
            kept = {k: old_q[k] for k in pinned
                    if k in old_q and old_q[k] < pinned[k]}
            pinned.update(kept)
            if kept:
                print(f"[bench-audit] downward-only: kept {len(kept)} "
                      "existing tighter pin(s); pass --replace to raise "
                      "pins from this run")
        elif replace and os.path.exists(baseline):
            with open(baseline) as f:
                old_q = json.load(f).get("queries", {})
            raised = sorted(k for k in pinned
                            if k in old_q and pinned[k] > old_q[k])
            if raised:
                print(f"[bench-audit] --replace RAISED {len(raised)} "
                      f"pin(s): {', '.join(raised)}")
        base = {
            "sf": d.get("sf"),
            "calib_pre_sec": pre,
            "calib_post_sec": post,
            "rel": float(rel_opt) if rel_opt else REL,
            "abs": float(abs_opt) if abs_opt else ABS,
            "queries": pinned,
        }
        if io_cur:
            base["calib_io_pre_sec"] = d.get("calib_io_pre_sec")
            base["calib_io_post_sec"] = d.get("calib_io_post_sec")
        if sched_cur:
            base["calib_sched_pre_sec"] = d.get("calib_sched_pre_sec")
            base["calib_sched_post_sec"] = d.get("calib_sched_post_sec")
        if d.get("gate_sentinels"):
            # per-gate brackets anchor future per-gate floor scaling the
            # same self-anchored way the suite pairs do (r15)
            base["gate_sentinels"] = {
                k: [round(v, 4) for v in vs]
                for k, vs in sorted(d["gate_sentinels"].items())}
        if d.get("calib_decile_sec"):
            base["calib_decile_sec"] = [
                round(v, 4) for v in d["calib_decile_sec"]]
        with open(baseline, "w") as f:
            json.dump(base, f, indent=1, sort_keys=True)
        print(f"[bench-audit] recorded {len(cur)} baselines "
              f"(headroom +{base['rel']:.0%}+{base['abs']}s) -> {baseline}")
        return

    if not os.path.exists(baseline):
        print(f"[bench-audit] no baseline at {baseline} — run with --record")
        sys.exit(2)
    with open(baseline) as f:
        base = json.load(f)
    bq = base["queries"]
    rel = base.get("rel", REL)
    abs_ = base.get("abs", ABS)

    # cross-SF artifacts are not comparable — refuse, don't "improve"
    if base.get("sf") and d.get("sf") and base["sf"] != d["sf"]:
        print(f"[bench-audit] FAIL: artifact sf={d['sf']} does not match "
              f"baseline sf={base['sf']} — wrong artifact or baseline")
        sys.exit(2)

    shared = sorted(set(bq) & set(cur))
    added = sorted(set(cur) - set(bq))
    gone = sorted(set(bq) - set(cur))

    # graded sentinel band (r13): an elevated-but-not-dirty box scales
    # every allowance by its own measured factor — see the module doc
    clean = d.get("calib_clean_sec", CALIB_CLEAN)
    scale = worst / clean if worst / clean > 1.15 and not dirty else 1.0
    if scale > 1.0:
        print(f"[bench-audit] box ELEVATED: calib {worst:.3f} = "
              f"{worst / clean:.2f}x clean — scaling headroom by that "
              "factor (code regressions stack on top and still breach)")

    # streaming-floor graded band (r14, VERDICT item 3): the CPU spin is
    # blind to what a micro-batch pays — fsync latency (io sentinel) and
    # DAGScheduler round trips (sched sentinel). For stream_* queries
    # ONLY (the queries whose cost is actually floor-shaped), the
    # allowance additionally scales by the worst self-anchored floor
    # elevation; batch queries keep the CPU band alone, plus the
    # existing uniform io-dirty escape.
    io_base = io_pair(base)
    sched_base = sentinel_pair(base, "calib_sched")
    floor = max(floor_scale(io_cur, io_base),
                floor_scale(sched_cur, sched_base)) if not dirty else 1.0
    stream_scale = max(scale, floor)
    if floor > 1.0:
        print(f"[bench-audit] streaming floor ELEVATED: worst sentinel "
              f"{floor:.2f}x the baseline's recorded pair — scaling "
              "stream_* allowances by that factor (batch gates unscaled)")

    def gate_floor(n):
        """Per-gate floor scale for stream gate `n` (r15): the gate's
        own bracket (taken seconds around its reps — immune to the
        mid-suite-burst blind spot) anchored to the baseline's bracket
        for the same gate, falling back to the baseline's suite pair
        for baselines recorded before bracketing. Combined max() with
        the suite-level floor so whichever sentinel actually saw the
        burst wins; 1.0 when the gate has no bracket (pre-r15
        artifact) so the suite-level path is unchanged."""
        g_io, g_sched = gate_bracket(d, n)
        if not g_io and not g_sched:
            return 1.0
        b_io, b_sched = gate_bracket(base, n)
        f = max(floor_scale(g_io, b_io or io_base),
                floor_scale(g_sched, b_sched or sched_base))
        return f

    per_gate = {}
    if not dirty:
        for n in shared:
            if n.startswith("stream_"):
                g = gate_floor(n)
                if g > 1.0:
                    per_gate[n] = g
    if per_gate:
        worst_g = max(per_gate, key=per_gate.get)
        print(f"[bench-audit] per-gate floor ELEVATED on "
              f"{len(per_gate)} stream gate(s) (worst {worst_g} "
              f"{per_gate[worst_g]:.2f}x its bracket) — scaling those "
              "gates' allowances individually")

    def allowance(n):
        if n.startswith("stream_"):
            s = max(stream_scale, per_gate.get(n, 1.0))
        else:
            s = scale
        return bq[n] * (1 + rel) * s + abs_

    breaches = [(n, bq[n], cur[n]) for n in shared
                if cur[n] > allowance(n)]
    # uniform-inflation detector: count noise-floor-exceeding moves by
    # direction over ALL shared queries (not just gate breaches)
    up = sum(1 for n in shared if cur[n] - bq[n] > max(0.10 * bq[n], 0.05))
    uniform = shared and up / len(shared) >= UNIFORM_FRACTION

    improved = [(n, bq[n], cur[n]) for n in shared
                if bq[n] > cur[n] * (1 + rel) + abs_]

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
            # io-dirty escape (r13): the CPU spin can sit clean while
            # host storage contention inflates every fsync/scan-heavy
            # query — self-anchored to the baseline's own recorded io.
            # BOTH samples must exceed 2x the baseline's worst: the
            # pair's within-run spread measured 1.6x on a HEALTHY box,
            # so a single-sample 1.5x test would let a real shared-
            # kernel regression ride a noise spike to a green exit
            if io_base and len(io_cur) == 2 and \
                    min(io_cur) > max(io_base) * 2.0:
                print(f"[bench-audit] {len(breaches)} breach(es), "
                      f"inflation UNIFORM ({up}/{len(shared)} up), CPU "
                      "calib clean but IO sentinel DIRTY (both samples "
                      f"{min(io_cur):.3f}/{max(io_cur):.3f} > 2x the "
                      f"{max(io_base):.3f} recorded) — machine-attributed "
                      "(storage contention), WARN only. Re-run on an "
                      "idle box.")
                sys.exit(0)
            # clean calib CONTRADICTS the co-tenant-load explanation: a
            # shared-kernel slowdown (tokenizer, md5) inflates the suite
            # uniformly too, and it is exactly code. (ADVICE r11)
            if accept_uniform:
                print(f"[bench-audit] {len(breaches)} breach(es), inflation "
                      f"UNIFORM ({up}/{len(shared)} up) with CLEAN calib — "
                      "downgraded by --accept-uniform. Record WHY in the "
                      "ledger.")
                sys.exit(0)
            band = ("CLEAN" if scale == 1.0 else
                    f"ELEVATED ({worst / clean:.2f}x, already scaled into "
                    "the allowance)")
            print(f"[bench-audit] FAIL: {len(breaches)} breach(es), "
                  f"inflation UNIFORM ({up}/{len(shared)} up) but calib is "
                  f"{band} — the sentinel does not support co-tenant load "
                  "at this size; suspect a shared kernel (tokenizer/md5) "
                  "regression. Pass --accept-uniform only with an "
                  "attribution in hand.")
            sys.exit(1)
        print(f"[bench-audit] FAIL: {len(breaches)} code-attributable "
              f"regression(s) (calib clean, inflation not uniform)")
        sys.exit(1)
    if uniform and not dirty:
        print(f"[bench-audit] NOTE: no gate breach, but {up}/{len(shared)} "
              "queries are above the noise floor with clean calib — "
              "sub-headroom uniform drift; watch the next artifact.")
    print(f"[bench-audit] OK: {len(shared)} queries within "
          f"+{rel:.0%}+{abs_}s of baseline"
          + (f"; {len(improved)} improved (consider --record)"
             if improved else ""))


if __name__ == "__main__":
    main()
