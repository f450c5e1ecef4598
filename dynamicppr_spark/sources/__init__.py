"""Sources: repo_files ETL, Iceberg-gated readers, TPC-H graph builders."""

from dynamicppr_spark.sources.iceberg import read_repo_files
from dynamicppr_spark.sources.repo_files import (
    assign_vertex_ids,
    build_link_graph,
    extract_cocommit_edges,
    extract_dependency_edges,
)
from dynamicppr_spark.sources.tpch_graph import (
    load_table,
    part_cooccurrence_edges,
    supplier_customer_edges,
)

__all__ = [
    "read_repo_files",
    "assign_vertex_ids",
    "build_link_graph",
    "extract_cocommit_edges",
    "extract_dependency_edges",
    "load_table",
    "part_cooccurrence_edges",
    "supplier_customer_edges",
]
