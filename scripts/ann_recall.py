#!/usr/bin/env python3
"""ANN recall-at-scale curve (round-12 verdict ask #6): drive
graft.tools.RecallProbe over the 1x/3x/10x growth fixtures (same dirs as
scale_sweep.py) and record recall@5 (q31 IVF search) and recall@3 (q73
kNN-graph edges) vs brute-force cosine on a ~200-probe deterministic
sample, alongside the ivf_k the engine derived at each scale. Dev-side
tooling — NOT part of the library runtime.

Usage: ann_recall.py [tag]   (writes bench_logs/ann_recall_<tag>.json)
"""
import json, os, subprocess, sys

ROOT = "/root/repo"
DIRS = [("x1", "/root/testdata/sf0.1"),
        ("x3", f"{ROOT}/scratch/scale/x3"),
        ("x10", f"{ROOT}/scratch/scale/x10"),
        # round-16 verdict task #4: recall evidence over a 30x span
        ("x30", f"{ROOT}/scratch/scale/x30"),
        # round-17 verdict task #3: the TIGHT-band planted corpus
        # (families of 4 at cosine 0.98/0.96/0.94 — strong neighbor
        # structure), where the NN-descent radius-1 seed should clear
        # the 0.8 recall floor and the dial's cheap branch fires
        ("x4tight", f"{ROOT}/scratch/scaletight/x4"),
        # round-17 verdict task #7: document-DERIVED vectors (hashed-
        # bigram log-count profiles of the actual sf0.1 documents, from
        # graft.tools.DocVectors) — the dial demonstrated on data shaped
        # like what a curation run embeds, not only planted synthetics
        ("docvec", f"{ROOT}/scratch/docvec")]
DIRS = [t for t in DIRS if os.path.isdir(t[1])]
TAG = sys.argv[1] if len(sys.argv) > 1 else "r13"

def probe(tag, d, cells=None):
    env = {**os.environ, "SPARK_GRAFT_SF_DIR": d, "SPARK_GRAFT_CPUS": "32"}
    # a caller-shell export of the dial var would silently turn the
    # baseline legs into override runs recorded as default-k (r13 advice)
    env.pop("SPARK_GRAFT_IVF_CELLS", None)
    if cells is not None:
        env["SPARK_GRAFT_IVF_CELLS"] = str(cells)
    print(f"=== {tag} ({d}, cells={cells}) ===", flush=True)
    p = subprocess.run(["sbt", "-batch", "runMain graft.tools.RecallProbe"],
                       cwd=ROOT, env=env, check=True, capture_output=True,
                       text=True)
    line = [l for l in p.stdout.splitlines() if '"metric":"ann_recall"' in l]
    r = json.loads(line[-1])
    print(r, flush=True)
    return r

out = {}
for tag, d in DIRS:
    out[tag] = probe(tag, d)
# the ivf_k DIAL at 10x: k = n^(2/3) bounds the kNN-graph candidate
# volume at nProbe*n^(4/3) (vs n^1.5 under k = sqrt(n)); this leg
# measures the recall that faster-growing k costs
if "x10" in out:
    n10 = out["x10"]["n_vecs"]
    x10dir = dict((t, d) for t, d in DIRS)["x10"]
    out["x10_dial"] = probe("x10_dial", x10dir, cells=round(n10 ** (2 / 3)))

path = f"{ROOT}/bench_logs/ann_recall_{TAG}.json"
json.dump(out, open(path, "w"), indent=1)
print(f"wrote {path}")
