#!/bin/bash
# Round-4 scaling evidence battery (VERDICT r3 items 1, 2, 7).
# Sequential: each run owns the box; all kernel medians are n>=3.
set -x
cd /root/repo
export BENCH_REPEATS=3
# primary pair: full suite, local[8] vs local[32]
python tools/scaling_bench.py --only low  --out BENCH/r4_lo8.json   2>BENCH/log_lo8.txt
python tools/scaling_bench.py --only high --out BENCH/r4_hi32.json  2>BENCH/log_hi32.txt
# clones pair: 8x per-superstep work, K3 focus (the open question)
export BENCH_ONLY=q_pagerank,q_pagerank_local
python tools/scaling_bench.py --only low  --factor clones=8 --out BENCH/r4_clones_lo8.json  2>BENCH/log_clones_lo8.txt
python tools/scaling_bench.py --only high --factor clones=8 --out BENCH/r4_clones_hi32.json 2>BENCH/log_clones_hi32.txt
# second operating point: local[4] -> local[16], PPR-df + K3-df
export BENCH_ONLY=q_pagerank,q_ppr_static
python tools/scaling_bench.py --low 4 --high 16 --only low  --out BENCH/r4_p2_lo4.json  2>BENCH/log_p2_lo4.txt
python tools/scaling_bench.py --low 4 --high 16 --only high --out BENCH/r4_p2_hi16.json 2>BENCH/log_p2_hi16.txt
echo ALL_RUNS_DONE
