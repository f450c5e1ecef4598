"""dynamicppr_spark — a from-scratch PySpark-native dynamic link-graph engine.

Re-expresses the capabilities of ``guowentian/dynamicppr`` (forward-push
personalized PageRank maintained incrementally under batched edge
insertions/deletions; see W. Guo, Y. Li, M. Sha, K.-L. Tan, "Parallel
Personalized PageRank on Dynamic Graphs", PVLDB 10(12), 2017) as an
idiomatic Spark DataFrame engine, plus batch PageRank, connected
components, label propagation and triangle counting, and the ETL that
derives the edge table from an Iceberg-shaped ``repo_files`` corpus.

NOTE ON CITATIONS: the reference checkout at /root/reference is an empty
directory in this sandbox (verified; see SURVEY.md §0), so no file:line
citations into it are possible. Algorithm semantics are pinned instead by
sequential numpy oracles in tests/oracle.py and by BASELINE.json's
north-star description.

Package layout (SURVEY.md §2 operator ids in parentheses):
  graph.py            LinkGraph: edge table, partitioning, degrees, CSR blocks (E7, E8)
  session.py          SparkSession builder with engine defaults
  operators/          graph kernels K1-K8 + superstep/checkpoint harness
  sources/            repo_files ETL (E1-E6), edge-update batches (S2, E9),
                      TPC-H-table graph builders for the driver oracle round
  functions/          text analysis, dedup, similarity search, multimodal stubs
  plans/              partitioning/skew policy + explain helpers
  streaming/          Structured Streaming surface over the dynamic path
"""

from dynamicppr_spark.graph import LinkGraph
from dynamicppr_spark.session import get_spark

__all__ = ["LinkGraph", "get_spark"]
__version__ = "0.1.0"
