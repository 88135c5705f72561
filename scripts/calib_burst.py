#!/usr/bin/env python3
"""Bursty-load calibration validation (round-17 verdict #3): the r17
validation ran a CONSTANT 16-spinner session, a shape the start-only v1
min normalizes just as well as v2's window mean — the case v2 was built
for (the r16 failure: a burst arriving MID-session that the start probes
dodge entirely) was never reproduced. This driver runs the
comparable-11 bench twice — once idle, once with 16 CPU spinners
injected ONLY during the middle third of the timed section (started when
the [bench] progress line crosses 1/3 of the queries, killed at 2/3) —
and reports whether v1's start-min normalization misses (>10%) while
v2's in-session window mean lands (±10%) against the idle run.

Same-shape sessions compare directly (the normalization REFERENCE
constants cancel in the loaded/idle ratio), so the full-headline
context-binding of calibration_ref_secs does not apply here.

Usage: calib_burst.py [tag]   (writes
bench_logs/calib_validation_<tag>_{idle,burst}.json + a _summary)

Dev-side tooling — NOT part of the library runtime.
"""
import json, os, shutil, signal, subprocess, sys, time

ROOT = "/root/repo"
TAG = sys.argv[1] if len(sys.argv) > 1 else "r18"
# the fixed-forever comparable-11 set (one substring each, matching
# exactly one headline entry)
ONLY = ("q01_,q02_,q04_,q07_,q12_,q19_,q21_,q26_,q27_,q30_,q33_")
N_Q = 11
BURST_START = N_Q // 3          # spinners up after this progress line
BURST_END = (2 * N_Q) // 3      # spinners down after this one
N_SPIN = 16


def run_bench(log_path, burst):
    env = {**os.environ, "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.1",
           "SPARK_GRAFT_CPUS": "32", "SPARK_GRAFT_BENCH_ONLY": ONLY}
    log = open(log_path, "w")
    p = subprocess.Popen(["sbt", "-batch", "runMain graft.Bench"],
                         cwd=ROOT, env=env, stdout=log,
                         stderr=subprocess.STDOUT)
    spinners = []
    started = stopped = None
    try:
        pos = 0
        while p.poll() is None:
            time.sleep(2)
            with open(log_path) as f:
                f.seek(pos)
                chunk = f.read()
                pos = f.tell()
            for line in chunk.splitlines():
                if "[bench] " not in line or "/" not in line:
                    continue
                try:
                    idx = int(line.split("[bench] ")[1].split("/")[0])
                except (ValueError, IndexError):
                    continue
                if burst and not spinners and started is None \
                        and idx >= BURST_START:
                    spinners = [subprocess.Popen(
                        ["timeout", "900", "bash", "-c", "while :; do :; done"])
                        for _ in range(N_SPIN)]
                    started = idx
                    print(f"  spinners UP after query {idx}", flush=True)
                if spinners and idx >= BURST_END:
                    for s in spinners:
                        s.send_signal(signal.SIGKILL)
                    spinners = []
                    stopped = idx
                    print(f"  spinners DOWN after query {idx}", flush=True)
    finally:
        for s in spinners:
            s.send_signal(signal.SIGKILL)
        log.close()
    if p.returncode != 0:
        raise SystemExit(f"bench failed, see {log_path}")
    full = json.load(open(f"{ROOT}/bench_logs/bench_full_last.json"))
    full["_burst_window"] = {"spinners": N_SPIN if burst else 0,
                             "up_after_query": started,
                             "down_after_query": stopped}
    return full


def comp11(full):
    names = ["q01_pricing_summary", "q02_filter_pushdown", "q04_join_star",
             "q07_window_rank", "q12_topk", "q19_wordcount",
             "q21_mr_wordcount", "q26_dedup_exact", "q27_dedup_minhash",
             "q30_cosine_topk", "q33_stream_tumbling"]
    return sum(full["queries"][n] for n in names)


print("=== idle leg ===", flush=True)
idle = run_bench(f"/tmp/calib_{TAG}_idle.log", burst=False)
print("=== burst leg (middle-third spinners) ===", flush=True)
burst = run_bench(f"/tmp/calib_{TAG}_burst.log", burst=True)

out = {}
for name, full in [("idle", idle), ("burst", burst)]:
    out[name] = {
        "raw_comp11": round(comp11(full), 3),
        "calibration_secs_min": full["calibration_secs"],
        "calibration_secs_mean": full["calibration_secs_mean"],
        "calibration_window": full.get("calibration_window"),
        "calibration_window_n": full.get("calibration_window_n"),
        "v1_normalized": full["subtotal_comparable11_normalized"],
        "v2_normalized": full["subtotal_comparable11_normalized_v2"],
        "loadavg_before": full.get("loadavg_before"),
        "loadavg_after": full.get("loadavg_after"),
        "burst_window": full.get("_burst_window"),
    }
    json.dump(full, open(
        f"{ROOT}/bench_logs/calib_validation_{TAG}_{name}.json", "w"))

raw_ratio = out["burst"]["raw_comp11"] / out["idle"]["raw_comp11"]
v1_ratio = out["burst"]["v1_normalized"] / out["idle"]["v1_normalized"]
v2_ratio = out["burst"]["v2_normalized"] / out["idle"]["v2_normalized"]
out["verdict"] = {
    "raw_burst_over_idle": round(raw_ratio, 4),
    "v1_burst_over_idle": round(v1_ratio, 4),
    "v2_burst_over_idle": round(v2_ratio, 4),
    "v1_misses_gt_10pct": abs(v1_ratio - 1) > 0.10,
    "v2_lands_within_10pct": abs(v2_ratio - 1) <= 0.10,
}
json.dump(out, open(
    f"{ROOT}/bench_logs/calib_validation_{TAG}_summary.json", "w"), indent=1)
print(json.dumps(out["verdict"], indent=1))
print(f"wrote bench_logs/calib_validation_{TAG}_{{idle,burst,summary}}.json")
