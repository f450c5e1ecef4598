"""Experiment: what makes PPR supersteps scale 8 -> 32 cores?

Factors: mode (df/csr), n_sources (1/32), AQE (on/off).
Usage: python tools/exp_scaling.py <cpus> [sf_dir]
Prints one JSON line per config.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from dynamicppr_spark.graph import LinkGraph  # noqa: E402
from dynamicppr_spark.operators.ppr import PPREngine  # noqa: E402
from dynamicppr_spark.session import get_spark  # noqa: E402
from dynamicppr_spark.sources.tpch_graph import part_cooccurrence_edges  # noqa: E402

CPUS = int(sys.argv[1])
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
STEPS = 8

spark = get_spark(f"exp{CPUS}", master=f"local[{CPUS}]", shuffle_partitions=64)
edges = part_cooccurrence_edges(spark, SF_DIR, directed_both_ways=True)
g = LinkGraph(edges, num_partitions=64)
g.scatter_edges.count()
g.csr_blocks().count()
top = [
    r["src"]
    for r in g.out_degrees.orderBy(F.desc("outdeg"), F.asc("src")).limit(32).collect()
]

for aqe in ("true", "false"):
    spark.conf.set("spark.sql.adaptive.enabled", aqe)
    for mode in ("df", "csr"):
        for ns in (1, 32):
            eng = PPREngine(g, top[:ns], eps=0.0, max_supersteps=STEPS, mode=mode)
            t = time.time()
            eng.push_to_convergence()
            w = time.time() - t
            print(
                json.dumps(
                    {
                        "cpus": CPUS,
                        "aqe": aqe,
                        "mode": mode,
                        "n_sources": ns,
                        "steps_per_sec": round(STEPS / w, 4),
                        "wall": round(w, 2),
                    }
                ),
                flush=True,
            )
spark.stop()
