"""Round 7: bigger graph (customer co-purchase ~9M edges).
Usage: python tools/exp_scaling7.py <cpus>"""
import json, sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from pyspark.sql import functions as F
from dynamicppr_spark.graph import LinkGraph
from dynamicppr_spark.operators.ppr import PPREngine
from dynamicppr_spark.session import get_spark
from dynamicppr_spark.sources.tpch_graph import load_table

CPUS = int(sys.argv[1])
spark = get_spark(f"exp7_{CPUS}", master=f"local[{CPUS}]", shuffle_partitions=64,
                  extra_confs={"spark.sql.adaptive.enabled": "false"})
li = load_table(spark, "/root/testdata/sf0.1", "lineitem").select("l_orderkey", "l_partkey")
orders = load_table(spark, "/root/testdata/sf0.1", "orders").select("o_orderkey", "o_custkey")
cp = (li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p")).distinct())
a = cp.select(F.col("c"), F.col("p").alias("src"))
b = cp.select(F.col("c"), F.col("p").alias("dst"))
und = a.join(b, "c").filter(F.col("src") < F.col("dst")).select("src", "dst").distinct()
edges = und.unionByName(und.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
g = LinkGraph(edges, num_partitions=64)
ne = g.edges.count(); g.scatter_edges.count(); g.out_degrees.count()
print(json.dumps({"cpus": CPUS, "n_edges": ne}), flush=True)
top = [r["src"] for r in g.out_degrees.orderBy(F.desc("outdeg"), F.asc("src")).limit(32).collect()]
PPREngine(g, top[:2], eps=0.0, max_supersteps=1).push_to_convergence()
for rep in range(2):
    eng = PPREngine(g, top, eps=0.0, max_supersteps=3, mode="df")
    t = time.time(); eng.push_to_convergence(); w = time.time() - t
    print(json.dumps({"cpus": CPUS, "rep": rep, "steps_per_sec": round(3 / w, 4),
                      "wall": round(w, 2)}), flush=True)
spark.stop()
