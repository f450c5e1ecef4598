"""Round 8: csr mode scaling post-rotation. Usage: exp_scaling8.py <cpus>"""
import json, sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from pyspark.sql import functions as F
from dynamicppr_spark.graph import LinkGraph
from dynamicppr_spark.operators.ppr import PPREngine
from dynamicppr_spark.session import get_spark
from dynamicppr_spark.sources.tpch_graph import part_cooccurrence_edges

CPUS = int(sys.argv[1])
spark = get_spark(f"exp8_{CPUS}", master=f"local[{CPUS}]", shuffle_partitions=64,
                  extra_confs={"spark.sql.adaptive.enabled": "false"})
edges = part_cooccurrence_edges(spark, "/root/testdata/sf0.1", directed_both_ways=True)
g = LinkGraph(edges, num_partitions=64)
g.csr_blocks().count(); g.out_degrees.count(); g.scatter_edges.count()
top = [r["src"] for r in g.out_degrees.orderBy(F.desc("outdeg"), F.asc("src")).limit(32).collect()]
PPREngine(g, top[:2], eps=0.0, max_supersteps=1, mode="csr").push_to_convergence()
for mode in ("csr", "df"):
    for rep in range(2):
        eng = PPREngine(g, top, eps=0.0, max_supersteps=5, mode=mode)
        t = time.time(); eng.push_to_convergence(); w = time.time() - t
        print(json.dumps({"cpus": CPUS, "mode": mode, "rep": rep,
                          "steps_per_sec": round(5 / w, 4), "wall": round(w, 2)}), flush=True)
spark.stop()
