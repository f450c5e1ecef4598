"""Round 4: rotation + repetitions for variance control.
Usage: python tools/exp_scaling4.py <cpus> <reps>"""
import json, sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from pyspark.sql import functions as F
from dynamicppr_spark.graph import LinkGraph
from dynamicppr_spark.operators.ppr import PPREngine
from dynamicppr_spark.session import get_spark
from dynamicppr_spark.sources.tpch_graph import part_cooccurrence_edges

CPUS = int(sys.argv[1]); REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
spark = get_spark(f"exp4_{CPUS}", master=f"local[{CPUS}]", shuffle_partitions=64,
                  extra_confs={"spark.sql.adaptive.enabled": "false"})
edges = part_cooccurrence_edges(spark, "/root/testdata/sf0.1", directed_both_ways=True)
g = LinkGraph(edges, num_partitions=64)
g.scatter_edges.count(); g.out_degrees.count()
top = [r["src"] for r in g.out_degrees.orderBy(F.desc("outdeg"), F.asc("src")).limit(32).collect()]
# warmup
PPREngine(g, top[:4], eps=0.0, max_supersteps=2).push_to_convergence()
for rep in range(REPS):
    for ns, steps in ((1, 8), (32, 5)):
        eng = PPREngine(g, top[:ns], eps=0.0, max_supersteps=steps, mode="df")
        t = time.time(); eng.push_to_convergence(); w = time.time() - t
        print(json.dumps({"cpus": CPUS, "rep": rep, "n_sources": ns,
                          "steps_per_sec": round(steps / w, 4), "wall": round(w, 2)}), flush=True)
spark.stop()
