"""Scaling-efficiency evidence + factor experiments (one harness).

Primary protocol (BASELINE.json cluster-size criterion, sandbox stand-in
per driver instruction): run bench.py at two parallelism levels on the
same input and report efficiency = throughput(high) / (factor *
throughput(low)), target >= 0.8.

    python tools/scaling_bench.py                       # local[8] vs local[32]
    python tools/scaling_bench.py --protocol local-cluster
        # separate executor JVMs: local-cluster[2,4,4096] vs [8,4,4096]

Factor experiments (replaces the round-1 one-off exp_scaling*.py scripts;
their conclusions live in BENCH/BASELINE.md):

    python tools/scaling_bench.py --factor aqe=true --no-write
    python tools/scaling_bench.py --factor sources=128 --no-write
    python tools/scaling_bench.py --factor steps_per_job=4 --no-write
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

KERNEL_THROUGHPUTS = {
    "PPR supersteps/sec, distributed (K1)": "ppr_supersteps_per_sec",
    "PPR supersteps/sec, broadcast-CSR (K1)": "ppr_bcsr_supersteps_per_sec",
    "PageRank supersteps/sec, distributed (K3)": "pagerank_supersteps_per_sec",
    "PageRank supersteps/sec, local gate (K3)": "pagerank_local_supersteps_per_sec",
    "edge-updates/sec, 32-source auto (K2)": "edge_updates_per_sec",
    "edge-updates/sec, distributed df (K2)": "edge_updates_per_sec_df",
}

FACTOR_ENV = {
    "aqe": "BENCH_AQE",
    "sources": "BENCH_PPR_SOURCES",
    "steps_per_job": "BENCH_STEPS_PER_JOB",
    "pr_steps_per_job": "BENCH_PR_STEPS_PER_JOB",
    "update_batches": "BENCH_UPDATE_BATCHES",
    "updates_per_batch": "BENCH_UPDATES_PER_BATCH",
    "repeats": "BENCH_REPEATS",
    "clones": "BENCH_GRAPH_CLONES",
    "pr_iters": "BENCH_PR_ITERS",
    "ppr_supersteps": "BENCH_PPR_SUPERSTEPS",
}


def run_bench(master_expr: str, cpus: int, sf_dir: str, extra_env: dict) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_MASTER"] = master_expr
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env.setdefault("BENCH_AQE", "false")  # fixed-size supersteps: AQE's
    # per-stage re-planning is serial driver time
    env.update(extra_env)
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
        check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    res["_wall"] = time.time() - t0
    res["_master"] = master_expr
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument(
        "--protocol", choices=["local", "local-cluster"], default="local",
        help="local = threads in one JVM; local-cluster = separate "
        "executor JVMs (N/4-executor x 4-core layout)",
    )
    ap.add_argument(
        "--factor", action="append", default=[],
        metavar="NAME=VALUE",
        help=f"bench factor override, one of {sorted(FACTOR_ENV)}",
    )
    ap.add_argument("--no-write", action="store_true",
                    help="print JSON only; do not rewrite BENCH/BASELINE.md")
    ap.add_argument("--only", choices=["low", "high"],
                    help="run just one level and dump its JSON to --out")
    ap.add_argument("--out", help="JSON dump path for --only")
    ap.add_argument("--assemble", nargs=2, metavar=("LO_JSON", "HI_JSON"),
                    help="skip running; build BASELINE.md from two dumps")
    args = ap.parse_args()
    factor = args.high / args.low

    extra_env = {}
    for f in args.factor:
        name, _, val = f.partition("=")
        extra_env[FACTOR_ENV[name]] = val

    def master(cpus: int) -> str:
        if args.protocol == "local-cluster":
            return f"local-cluster[{max(1, cpus // 4)},4,4096]"
        return f"local[{cpus}]"

    if args.only:
        cpus = args.low if args.only == "low" else args.high
        res = run_bench(master(cpus), cpus, args.sf_dir, extra_env)
        payload = json.dumps(res)
        if args.out:
            Path(args.out).write_text(payload)
        print(payload)
        return
    if args.assemble:
        lo = json.loads(Path(args.assemble[0]).read_text())
        hi = json.loads(Path(args.assemble[1]).read_text())
    else:
        print(f"bench @ {master(args.low)} ...", file=sys.stderr)
        lo = run_bench(master(args.low), args.low, args.sf_dir, extra_env)
        print(f"bench @ {master(args.high)} ...", file=sys.stderr)
        hi = run_bench(master(args.high), args.high, args.sf_dir, extra_env)

    effs = {}
    for label, key in KERNEL_THROUGHPUTS.items():
        tl, th = lo.get(key, 0.0), hi.get(key, 0.0)
        effs[key] = round(th / (factor * tl), 3) if tl else 0.0

    if args.no_write:
        print(json.dumps({"efficiency": effs, "low": lo, "high": hi}))
        return

    lines = [
        "# BENCH — measured baseline + scaling efficiency (round 3)",
        "",
        f"Input: `{args.sf_dir}` (sf={lo['sf']}), identical code/data at",
        f"`{master(args.low)}` (N) vs `{master(args.high)}` (4N) —",
        "sandbox stand-in for N vs 4N executors (no real cluster; per",
        "driver instruction). efficiency = throughput(4N) / "
        f"({factor:.0f} x throughput(N)); target >= 0.8 for the",
        "cluster-size criterion in BASELINE.json.",
        "",
        f"Graph: {lo.get('n_vertices')} vertices, {lo.get('n_edges')} edges "
        f"(clones={lo.get('graph_clones', 1)});",
        f"shuffle partitions: {lo['shuffle_partitions']} (N) / "
        f"{hi['shuffle_partitions']} (4N); repeats per kernel query: "
        f"{lo.get('repeats', 1)} (medians reported, spread in raw JSON).",
        "",
        "| kernel | throughput @N | throughput @4N | efficiency |",
        "|---|---|---|---|",
    ]
    for label, key in KERNEL_THROUGHPUTS.items():
        tl, th = lo.get(key, 0.0), hi.get(key, 0.0)
        eff = th / (factor * tl) if tl else 0.0
        lines.append(f"| {label} | {tl:.3f} | {th:.3f} | **{eff:.3f}** |")
    lines += [
        "",
        "| query | sec @N | sec @4N | speedup |",
        "|---|---|---|---|",
    ]
    for q in lo["queries"]:
        a, b = lo["queries"][q], hi["queries"].get(q, 0.0)
        lines.append(f"| {q} | {a:.2f} | {b:.2f} | {a/b if b else 0:.2f}x |")
    lines += [
        "",
        "## Methodology & bottleneck analysis (measured)",
        "",
        "Workloads: 32-source batched PPR (the reference's batched-query",
        "model) for both the static kernels and the update stream; updates",
        "are 200-edge batches applied to all 32 maintained sources.",
        "`q_ppr_updates` runs the engine's auto mode (broadcast-CSR local",
        "push, operators/local_push.py — the reference-parity in-memory",
        "path, size-gated); `q_ppr_updates_df` is the distributed",
        "DataFrame path that remains beyond the gate (the 100 TB path).",
        "AQE is off in the fixed-size kernel loops (per-stage re-planning",
        "is serial driver time); lineage is truncated every superstep with",
        "checkpoint rotation; 64 shuffle partitions at both levels.",
        "Kernel queries run BENCH_REPEATS times; the table reports the",
        "MEDIAN (this box is a noisy shared tenant: single-shot deltas",
        "under ~2x are not evidence — min/max spread is in the raw JSON).",
        "",
        "Round-3 df-update redesign (ppr.py apply_updates): one gated",
        "O(batch*deg) collect, ONE tagged checkpoint job evaluating graph",
        "deltas + the K2 adjustment (shared vectorized build_adjustment",
        "over driver mini-CSRs) with observation-fused counts/L1, a",
        "DELTA-ONLY re-push (push linearity), one merge job — ~4 jobs and",
        "ONE O(E) probe scan per batch. Also fixed this round: a",
        "per-checkpoint driver-cost DOUBLING on long update streams —",
        "localCheckpoint leaves keep an origin-plan linkage whose chain",
        "grows each superstep and whose stats re-walk is exponential;",
        "rddtrack.detach_plan_origin severs it (50-batch soak now flat,",
        "tests/test_soak.py).",
        "",
        "Round-1 factor study (consolidated into --factor flags here):",
        "tmpfs shuffle dir HURT, shuffle compression off HURT, separate",
        "executor JVMs (local-cluster) HURT at this data size (netty",
        "serialization dominates), bigger heap and bigger graphs were",
        "neutral, DataFrame scatter beat the Arrow/CSR cogroup mode.",
        "",
        "Honest read of the table above: the >=0.8 efficiency criterion is",
        "NOT met on this stand-in, and the direct reason is measured, not",
        "asserted. A Spark-free numpy triad probe (tools/membw_probe.py,",
        "barrier-synchronized processes, BENCH/membw.json) shows this",
        "box's aggregate DRAM bandwidth grows only ~1.9x from 8 to 32",
        "workers (53.6 -> 100.8 GB/s, max over repeated runs) — i.e. the",
        "HARDWARE ceiling for any bandwidth-bound kernel's 8->32 scaling",
        "efficiency on one box is ~0.47. The distributed PPR kernel",
        "sits at that envelope; the broadcast-CSR / local kernels (pure",
        "numpy sweeps, zero Spark overhead) are flat-to-negative for the",
        "same reason — 8 concurrent sweeps already saturate the memory",
        "subsystem. On a real N -> 4N EXECUTOR scale-up each node adds",
        "its own DRAM channels, which is exactly the resource that does",
        "not quadruple here. The round-3 clones run (BENCH_GRAPH_CLONES)",
        "raises per-superstep work to amortize the serial per-job floor —",
        "see the clones section below when present.",
        "",
        "Raw JSON:",
        "```json",
        json.dumps(lo),
        json.dumps(hi),
        "```",
    ]
    out = REPO / "BENCH"
    out.mkdir(exist_ok=True)
    (out / "BASELINE.md").write_text("\n".join(lines) + "\n")
    print(json.dumps({"efficiency": effs, "low": lo, "high": hi}))


if __name__ == "__main__":
    main()
