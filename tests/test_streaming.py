"""Structured Streaming surface: update feed -> foreachBatch -> PPREngine."""

from __future__ import annotations

import numpy as np
import pytest

from dynamicppr_spark.operators.ppr import PPREngine
from dynamicppr_spark.streaming.updates import (
    UPDATE_SCHEMA,
    run_update_stream,
    windowed_update_stats,
)
from tests import fixtures, oracle


@pytest.fixture()
def update_dir(spark, tmp_path):
    """Parquet directory acting as a file-stream source of edge updates."""
    edges, n = fixtures.cycle_graph(12)
    script = fixtures.update_script(edges, n, "mixed", n_batches=2)
    sdf = spark.createDataFrame(script[["batch_id", "op", "src", "dst", "ts"]])
    path = tmp_path / "updates"
    sdf.coalesce(1).write.parquet(str(path))
    return str(path), edges, n, script


def test_stream_drives_dynamic_ppr(spark, make_graph, update_dir):
    path, edges, n, script = update_dir
    eng = PPREngine(make_graph(edges, n), [0], eps=1e-4)
    eng.push_to_convergence()
    stream = spark.readStream.schema(UPDATE_SCHEMA).parquet(path)
    q = run_update_stream(eng, stream)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert eng.metrics.batches_applied == 2
    # end state matches static recompute on the final graph
    final_edges = fixtures.apply_script_numpy(edges, script)
    want = oracle.ppr_exact(final_edges, n, 0)
    got = np.zeros(n)
    for r in eng.scores().collect():
        got[int(r.vid)] = r.score
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_windowed_update_stats(spark, update_dir, tmp_path):
    path, _, _, script = update_dir
    stream = spark.readStream.schema(UPDATE_SCHEMA).parquet(path)
    q = (
        windowed_update_stats(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("upd_stats")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("select * from upd_stats").collect()
    # append mode emits only watermark-closed windows; accept >= 0 rows but
    # verify the aggregation plan executes and schema is as declared
    assert {c for c in spark.table("upd_stats").columns} == {
        "win_start", "op", "n",
    }
    total = sum(r.n for r in rows)
    assert total <= len(script)


def test_stream_drives_incremental_triangles(spark, make_graph, update_dir):
    """K6 analogue of the PPR stream test: the maintained count after the
    stream equals a full recount on the final graph."""
    from dynamicppr_spark.streaming.updates import (
        TriangleStreamState,
        run_triangle_stream,
    )

    path, edges, n, script = update_dir
    state = TriangleStreamState(make_graph(edges, n))
    assert state.count == oracle.triangle_count(edges, n)
    stream = spark.readStream.schema(UPDATE_SCHEMA).parquet(path)
    q = run_triangle_stream(state, stream)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert state.batches_applied == 2
    final_edges = fixtures.apply_script_numpy(edges, script)
    assert state.count == oracle.triangle_count(final_edges, n)
    state.graph.release()


def test_stream_drives_incremental_cc(spark, make_graph, update_dir):
    """K4 under the stream: final maintained labels == cold recompute on
    the final graph (CC has a unique fixed point, so this is exact)."""
    from dynamicppr_spark.operators.components import connected_components
    from dynamicppr_spark.streaming.updates import (
        ComponentsStreamState,
        run_label_stream,
    )
    from tests.conftest import df_to_map

    path, edges, n, script = update_dir
    state = ComponentsStreamState(make_graph(edges, n))
    stream = spark.readStream.schema(UPDATE_SCHEMA).parquet(path)
    q = run_label_stream(state, stream, query_name="cc_updates")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert state.batches_applied == 2
    got = df_to_map(state.labels, ["vid"], "component")
    final_edges = fixtures.apply_script_numpy(edges, script)
    want = oracle.connected_components(final_edges, n)
    assert got == {v: int(want[v]) for v in range(n)}
    state.graph.release()


def test_stream_drives_incremental_lpa(spark, make_graph, update_dir):
    """K5 under the stream: the maintained labeling is STABLE on the
    final graph (LPA has no unique fixed point; stability is the
    invariant — operators/lpa.py docstring)."""
    from dynamicppr_spark.operators.lpa import label_propagation
    from dynamicppr_spark.streaming.updates import (
        LPAStreamState,
        run_label_stream,
    )
    from tests.conftest import df_to_map

    path, edges, n, script = update_dir
    state = LPAStreamState(make_graph(edges, n))
    stream = spark.readStream.schema(UPDATE_SCHEMA).parquet(path)
    q = run_label_stream(state, stream, query_name="lpa_updates")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert state.batches_applied == 2
    # stability: one more warm until-stable run changes nothing
    again = label_propagation(
        state.graph, n_iter=50, init_labels=state.labels, until_stable=True
    )
    assert df_to_map(again, ["vid"], "label") == df_to_map(
        state.labels, ["vid"], "label"
    )
    state.graph.release()
