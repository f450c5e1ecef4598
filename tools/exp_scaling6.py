"""Round 6: local-cluster (separate executor JVMs) scaling.
Usage: python tools/exp_scaling6.py <n_executors> [cores_per_exec] [mem_mb]"""
import json, sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from pyspark.sql import functions as F
from dynamicppr_spark.graph import LinkGraph
from dynamicppr_spark.operators.ppr import PPREngine
from dynamicppr_spark.session import get_spark
from dynamicppr_spark.sources.tpch_graph import part_cooccurrence_edges

NE = int(sys.argv[1]); CORES = int(sys.argv[2]) if len(sys.argv) > 2 else 4
MEM = int(sys.argv[3]) if len(sys.argv) > 3 else 6144
spark = get_spark(f"exp6_{NE}", master=f"local-cluster[{NE},{CORES},{MEM}]",
                  shuffle_partitions=64,
                  extra_confs={"spark.sql.adaptive.enabled": "false"})
edges = part_cooccurrence_edges(spark, "/root/testdata/sf0.1", directed_both_ways=True)
g = LinkGraph(edges, num_partitions=64)
g.scatter_edges.count(); g.out_degrees.count()
top = [r["src"] for r in g.out_degrees.orderBy(F.desc("outdeg"), F.asc("src")).limit(32).collect()]
PPREngine(g, top[:4], eps=0.0, max_supersteps=2).push_to_convergence()
for rep in range(2):
    eng = PPREngine(g, top, eps=0.0, max_supersteps=5, mode="df")
    t = time.time(); eng.push_to_convergence(); w = time.time() - t
    print(json.dumps({"executors": NE, "cores": NE*CORES, "rep": rep,
                      "steps_per_sec": round(5 / w, 4), "wall": round(w, 2)}), flush=True)
spark.stop()
