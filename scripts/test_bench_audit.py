#!/usr/bin/env python3
"""Red-path tests for scripts/bench_audit.py — every exit-code branch
exercised on SYNTHETIC artifacts, so the audit's attribution logic is
pinned by a committed test instead of ad-hoc session runs (the r11-r13
ledgers record the same cases verified by hand; this makes them
durable).

Run: python3 scripts/test_bench_audit.py   (exit 0 = all paths hold)

Each case writes a baseline + artifact pair into a temp dir and runs
the audit as a subprocess, asserting on the exit code (the audit's
contract surface — the driver and close checklist branch on it).
"""
import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
AUDIT = os.path.join(HERE, "bench_audit.py")

CLEAN = {"calib_pre_sec": 0.21, "calib_post_sec": 0.22,
         "calib_io_pre_sec": 0.030, "calib_io_post_sec": 0.040,
         "calib_sched_pre_sec": 0.10, "calib_sched_post_sec": 0.12}


def artifact(queries, **calib):
    d = {"metric": "total", "unit": "sec", "sf": "/root/testdata/sf0.1",
         "reps": 2, "agg": "min", "queries": queries,
         "value": sum(queries.values())}
    d.update(calib)
    return d


def run(tmp, art, base=None, extra=()):
    apath = os.path.join(tmp, "art.json")
    with open(apath, "w") as f:
        json.dump(art, f)
    cmd = [sys.executable, AUDIT, apath]
    if base is not None:
        bpath = os.path.join(tmp, "base.json")
        with open(bpath, "w") as f:
            json.dump(base, f)
        cmd += ["--baseline", bpath]
    cmd += list(extra)
    p = subprocess.run(cmd, capture_output=True, text=True)
    return p.returncode, p.stdout + p.stderr


def baseline(queries, rel=0.25, abs_=0.30, **calib):
    b = {"sf": "/root/testdata/sf0.1", "rel": rel, "abs": abs_,
         "queries": queries}
    b.update(calib)
    return b


def check(name, got, want, out):
    if got != want:
        print(f"FAIL {name}: exit {got}, wanted {want}\n{out}")
        sys.exit(1)
    print(f"ok   {name} (exit {got})")


def main():
    q_ok = {"q_a": 1.0, "q_b": 2.0, "stream_x": 3.0, "stream_y": 4.0}

    with tempfile.TemporaryDirectory() as tmp:
        base = baseline(q_ok, **CLEAN)

        # 1. clean box, within headroom -> OK
        rc, out = run(tmp, artifact(dict(q_ok), **CLEAN), base)
        check("clean within headroom", rc, 0, out)

        # 2. UNINSTRUMENTED artifact (no calib at all) -> exit 2, and
        #    --record refuses (the ADVICE-r13 crash path: must be a
        #    clean exit-2, not a ValueError traceback)
        rc, out = run(tmp, artifact(dict(q_ok)), base)
        check("uninstrumented audit", rc, 2, out)
        assert "Traceback" not in out, out
        rc, out = run(tmp, artifact(dict(q_ok)), base, ["--record"])
        check("uninstrumented record refusal", rc, 2, out)
        assert "Traceback" not in out, out

        # 3. single-query regression, clean box -> FAIL 1
        q = dict(q_ok, q_b=2.0 * 1.6)
        rc, out = run(tmp, artifact(q, **CLEAN), base)
        check("single-query 2x clean", rc, 1, out)

        # 4. dirty CPU calib -> machine-attributed WARN (exit 0)
        dirty = dict(CLEAN, calib_pre_sec=0.50, calib_post_sec=0.48)
        rc, out = run(tmp, artifact(q, **dirty), base)
        check("dirty calib downgrade", rc, 0, out)

        # 5. missing query -> FAIL regardless of box state
        q_missing = {k: v for k, v in q_ok.items() if k != "q_a"}
        rc, out = run(tmp, artifact(q_missing, **dirty), base)
        check("missing query", rc, 1, out)

        # 6. SYNTHETIC FSYNC STALL (VERDICT-r13 item 3): storage+scheduler
        #    sentinels elevated ~1.8x vs the baseline's recorded pairs,
        #    CPU clean, stream_* inflated 1.7x while batch sits still.
        #    The old audit FAILed this (uniform detector does not fire:
        #    only 2/4 queries moved); the graded stream band absorbs it.
        stall = dict(CLEAN, calib_io_pre_sec=0.072, calib_io_post_sec=0.080,
                     calib_sched_pre_sec=0.22, calib_sched_post_sec=0.24)
        q_stall = dict(q_ok, stream_x=3.0 * 1.7, stream_y=4.0 * 1.7)
        rc, out = run(tmp, artifact(q_stall, **stall), base)
        check("fsync stall absorbed for stream_*", rc, 0, out)
        assert "streaming floor ELEVATED" in out, out

        # 7. ...but the SAME inflation with CLEAN floor sentinels is a
        #    streaming code regression and must still FAIL (the band
        #    only opens when the sentinels are actually elevated)
        rc, out = run(tmp, artifact(q_stall, **CLEAN), base)
        check("stream inflation, clean floor -> code", rc, 1, out)

        # 8. ...and a BATCH query must never ride the floor band: batch
        #    inflated 1.7x under the same elevated floor sentinels FAILs
        q_batch = dict(q_ok, q_b=2.0 * 1.7)
        rc, out = run(tmp, artifact(q_batch, **stall), base)
        check("batch gate ignores floor band", rc, 1, out)

        # 9. floor band is capped at 2x: a 5x stream inflation breaches
        #    even under arbitrarily elevated sentinels
        wild = dict(CLEAN, calib_io_pre_sec=0.30, calib_io_post_sec=0.30,
                    calib_sched_pre_sec=1.0, calib_sched_post_sec=1.0)
        q_wild = dict(q_ok, stream_x=3.0 * 5.0)
        rc, out = run(tmp, artifact(q_wild, **wild), base)
        check("floor band capped at 2x", rc, 1, out)

        # 10. pre-r14 baseline (no sched/io pairs recorded): the floor
        #     band stays dormant — elevated sentinels do NOT loosen the
        #     gate against a baseline that never measured them
        old_base = baseline(q_ok, calib_pre_sec=0.21, calib_post_sec=0.22)
        rc, out = run(tmp, artifact(q_stall, **stall), old_base)
        check("dormant band on pre-r14 baseline", rc, 1, out)

        # 11. uniform inflation + dirty io (both samples > 2x baseline's
        #     worst) with clean CPU -> storage-attributed WARN (r13 path)
        io_dirty = dict(CLEAN, calib_io_pre_sec=0.095, calib_io_post_sec=0.110)
        q_uniform = {k: v * 1.6 for k, v in q_ok.items()}
        rc, out = run(tmp, artifact(q_uniform, **io_dirty), base)
        check("uniform + io-dirty escape", rc, 0, out)

        # 12. uniform inflation with EVERY sentinel clean -> the
        #     shared-kernel-regression class, FAIL without --accept-uniform
        rc, out = run(tmp, artifact(q_uniform, **CLEAN), base)
        check("uniform + clean fails", rc, 1, out)
        rc, out = run(tmp, artifact(q_uniform, **CLEAN), base,
                      ["--accept-uniform"])
        check("--accept-uniform downgrade", rc, 0, out)

        # 13. elevated-but-not-dirty CPU (graded band): 1.3x calib scales
        #     every allowance; a 1.3x uniform inflation rides it...
        elev = dict(CLEAN, calib_pre_sec=0.285, calib_post_sec=0.285)
        q_elev = {k: v * 1.30 for k, v in q_ok.items()}
        rc, out = run(tmp, artifact(q_elev, **elev), base)
        check("graded CPU band absorbs box factor", rc, 0, out)
        #     ...but a genuine 2.2x single-query regression stacks on top
        q_stack = dict(q_elev, q_b=2.0 * 2.2)
        rc, out = run(tmp, artifact(q_stack, **elev), base)
        check("regression stacks over CPU band", rc, 1, out)

        # 14. record refusal on dirty / elevated boxes; acceptance on
        #     clean (the baseline-hygiene half of the same invariant)
        rc, out = run(tmp, artifact(dict(q_ok), **dirty), base, ["--record"])
        check("record refuses dirty", rc, 2, out)
        rc, out = run(tmp, artifact(dict(q_ok), **elev), base, ["--record"])
        check("record refuses elevated", rc, 2, out)
        rc, out = run(tmp, artifact(dict(q_ok), **CLEAN), base, ["--record"])
        check("record accepts clean", rc, 0, out)
        with open(os.path.join(tmp, "base.json")) as f:
            recorded = json.load(f)
        assert recorded["calib_sched_pre_sec"] == 0.10, recorded
        assert recorded["calib_io_pre_sec"] == 0.030, recorded

        # 15. PER-GATE bracket (r15): a mid-suite burst hits only
        #     stream_x — suite-level sentinels all CLEAN (the blind spot
        #     two closes burned on), but the gate's own bracket recorded
        #     the burst. Its inflation is absorbed per-gate...
        burst = dict(CLEAN, gate_sentinels={
            "stream_x": [0.072, 0.080, 0.22, 0.24],
            "stream_y": [0.031, 0.032, 0.10, 0.11]})
        q_burst = dict(q_ok, stream_x=3.0 * 1.7)
        rc, out = run(tmp, artifact(q_burst, **burst), base)
        check("per-gate bracket absorbs mid-suite burst", rc, 0, out)
        assert "per-gate floor ELEVATED" in out, out
        #     ...while the same inflation on a gate whose OWN bracket is
        #     clean stays a code regression (the band is per-gate)
        q_burst2 = dict(q_ok, stream_y=4.0 * 1.7)
        rc, out = run(tmp, artifact(q_burst2, **burst), base)
        check("clean-bracket gate still fails", rc, 1, out)
        #     ...and the per-gate band is capped at 2x like the suite one
        wild_burst = dict(CLEAN, gate_sentinels={
            "stream_x": [0.30, 0.30, 1.0, 1.0]})
        q_wild2 = dict(q_ok, stream_x=3.0 * 5.0)
        rc, out = run(tmp, artifact(q_wild2, **wild_burst), base)
        check("per-gate band capped at 2x", rc, 1, out)
        #     anchoring prefers the BASELINE's own bracket when recorded:
        #     baseline bracket already at 0.06 io means a 0.072 reading
        #     is only 1.2x — elevated, band opens smaller but still covers
        base_br = baseline(q_ok, **CLEAN)
        base_br["gate_sentinels"] = {"stream_x": [0.05, 0.06, 0.18, 0.20]}
        q_small = dict(q_ok, stream_x=3.0 * 1.45)
        rc, out = run(tmp, artifact(q_small, **burst), base_br)
        check("per-gate anchored to baseline bracket", rc, 0, out)

        # 15b. downward-only record (ADVICE r14): recording over an
        #      existing baseline keeps the tighter old pin per query;
        #      --replace raises and says so
        q_mixed = dict(q_ok, q_a=0.5, q_b=2.6)  # a faster, b slower
        rc, out = run(tmp, artifact(q_mixed, **CLEAN), base, ["--record"])
        check("downward-only record", rc, 0, out)
        assert "downward-only: kept 1 existing tighter pin" in out, out
        with open(os.path.join(tmp, "base.json")) as f:
            rec = json.load(f)["queries"]
        assert rec["q_a"] == 0.5 and rec["q_b"] == 2.0, rec
        rc, out = run(tmp, artifact(q_mixed, **CLEAN), base,
                      ["--record", "--replace"])
        check("--replace record raises", rc, 0, out)
        assert "RAISED 1 pin(s): q_b" in out, out
        with open(os.path.join(tmp, "base.json")) as f:
            rec = json.load(f)["queries"]
        assert rec["q_b"] == 2.6, rec

        # 16. DECILE probes (r15): a burst visible only to a mid-suite
        #     CPU probe makes worst dirty — uniform inflation downgrades
        #     to machine-attributed WARN even though pre/post sit clean
        decile_dirty = dict(CLEAN, calib_decile_sec=[0.22, 0.55, 0.23])
        rc, out = run(tmp, artifact(q_uniform, **decile_dirty), base)
        check("decile burst attributes uniform inflation", rc, 0, out)
        #     ...and --record refuses an artifact whose deciles saw churn
        rc, out = run(tmp, artifact(dict(q_ok), **decile_dirty), base,
                      ["--record"])
        check("record refuses decile-elevated box", rc, 2, out)

        # 17. tail-salvage must NOT swallow the r15 sentinel arrays as
        #     query reps: a driver-truncated artifact whose tail carries
        #     gate_sentinels (cut mid-object) + calib_decile_sec must
        #     salvage ONLY the real reps pairs — otherwise stream_x
        #     would "measure" its 0.05 s io probe and every audit would
        #     report phantom improvements
        import bench_diff
        tail = ('"stream_x":[3.1,3.0],"q_a":[1.0,1.1],'
                '"calib_decile_sec":[0.22,0.55,0.23],'
                '"gate_sentinels":{"stream_x":[0.05,0.053,0.268,0.209],'
                '"stream_y":[0.031,0.032')  # truncated mid-object
        tpath = os.path.join(tmp, "trunc.json")
        with open(tpath, "w") as f:
            json.dump({"n": 15, "rc": 0, "tail": tail}, f)
        _, cur = bench_diff.load(tpath)
        assert cur == {"stream_x": 3.0, "q_a": 1.0}, cur
        print("ok   tail-salvage ignores sentinel arrays")

    print("all bench_audit red paths hold")


if __name__ == "__main__":
    main()
