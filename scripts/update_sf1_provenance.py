#!/usr/bin/env python3
"""Flip the 10 carried sf1 gate verdicts to direct-at-HEAD after the
scripts/run_carried_sf1.sh sweep passes them all. One-shot r12 tool."""
import json, sys

path = "CORRECTNESS_sf1.json"
d = json.load(open(path))
q = d["queries"]
carried = [k for k, v in q.items()
           if v.get("r12_verdict") == "carried-r11+neutrality"]
expected = sys.argv[1:] if len(sys.argv) > 1 else carried
for k in expected:
    assert q[k]["r12_verdict"] == "carried-r11+neutrality", k
    q[k]["r12_verdict"] = "direct-sf1-at-r12-HEAD"
d["meta"]["r12_provenance"] = (
    "144/144 gates verified bit-exact at sf1 DIRECTLY at r12 HEAD — no gate "
    "carries an r11 verdict any more. The final 10 (corpus_curate + the "
    "minhash-replay dedup family + the trained-IVFPQ recall gates) were "
    "closed in the continuation wave: graft.Verify SPARK_GRAFT_ONLY over "
    "target/sf1 at 48g, then scripts/run_carried_sf1.sh (one DuckDB per "
    "gate, solo; per-gate wall times in target/carried_sf1.log — 44 s to "
    "10 min each). One oracle-side defect was found and fixed at the root: "
    "emb_recall_ivfpq_trained_m32's oracle OOM'd DuckDB 1.0 at every "
    "thread/memory setting tried (28t/80GB, 12t/96GB, 4t/105GB) because "
    "ivfPqDuckdbCore's adist stage aggregated a non-spillable "
    "list(l2 ORDER BY subspace) over pairs x m (125M+) join rows; the CTE "
    "was restructured to per-cand code lists + per-probe ADC tables with "
    "the identical subspace-order fold (bit-exact same doubles, "
    "Similarity.scala ivfPqDuckdbCore Scaladoc has the equivalence "
    "argument), after which the ENTIRE 7-gate IVFPQ family re-verified at "
    "sf1 in under 7 min at the default 28t/80GB knobs, and the full 144 "
    "re-passed at sf0.001 AND sf0.01."
)
json.dump(d, open(path, "w"), indent=1, sort_keys=True)
print(f"updated {len(expected)} gates: {expected}")
