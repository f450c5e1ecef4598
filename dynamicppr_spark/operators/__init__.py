"""Graph kernels (SURVEY.md §2c) + the superstep/checkpoint harness."""

from dynamicppr_spark.operators.components import connected_components
from dynamicppr_spark.operators.lpa import label_propagation
from dynamicppr_spark.operators.pagerank import pagerank
from dynamicppr_spark.operators.ppr import PPREngine, ppr
from dynamicppr_spark.operators.superstep import run_superstep_loop
from dynamicppr_spark.operators.triangles import per_vertex_triangles, triangle_count

__all__ = [
    "pagerank",
    "ppr",
    "PPREngine",
    "connected_components",
    "label_propagation",
    "triangle_count",
    "per_vertex_triangles",
    "run_superstep_loop",
]
