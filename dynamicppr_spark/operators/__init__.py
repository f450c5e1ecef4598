"""Graph kernels (SURVEY.md §2c) + the superstep/checkpoint harness."""

from dynamicppr_spark.operators.components import (
    connected_components,
    connected_components_incremental,
)
from dynamicppr_spark.operators.lpa import (
    label_propagation,
    label_propagation_incremental,
)
from dynamicppr_spark.operators.pagerank import pagerank, pagerank_local
from dynamicppr_spark.operators.ppr import PPREngine, ppr
from dynamicppr_spark.operators.superstep import run_superstep_loop
from dynamicppr_spark.operators.triangles import per_vertex_triangles, triangle_count

__all__ = [
    "pagerank",
    "pagerank_local",
    "ppr",
    "PPREngine",
    "connected_components",
    "connected_components_incremental",
    "label_propagation",
    "label_propagation_incremental",
    "triangle_count",
    "per_vertex_triangles",
    "run_superstep_loop",
]
