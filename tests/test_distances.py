"""Seed-distance kernel (operators/distances.py): multi-source BFS hop
counts, pinned by the pure-Python BFS in tests/oracle.py — static,
fixed-iteration truncation, incremental insert warm start, the delete
cold-recompute guard, and the maintained stream state."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests import fixtures, oracle


def _dist_map(df):
    return {r["vid"]: r["dist"] for r in df.collect()}


def test_seed_distances_path_and_truncation(spark, make_graph):
    from dynamicppr_spark.operators.distances import seed_distances

    edges, n = fixtures.path_graph(8)  # 0 -> 1 -> ... -> 7
    g = make_graph(edges, n)
    got = _dist_map(seed_distances(g, [0]))
    assert got == {v: v for v in range(n)}
    # fixed-iteration form truncates at the hop horizon (the oracle's
    # unrolled algebra) — only the <=2-hop shell is emitted
    got2 = _dist_map(seed_distances(g, [0], n_iter=2, until_stable=False))
    assert got2 == {0: 0, 1: 1, 2: 2}
    with pytest.raises(ValueError):
        seed_distances(g, [])
    g.release()


def test_seed_distances_multi_seed_random(spark, make_graph):
    from dynamicppr_spark.operators.distances import seed_distances

    edges, n = fixtures.rmat_graph(n=80, m=320, seed=11)
    g = make_graph(edges, n)
    seeds = [0, 17, 42]
    assert _dist_map(seed_distances(g, seeds)) == oracle.seed_distances(
        edges, n, seeds
    )
    g.release()


def test_seed_distances_incremental_insert_and_delete(spark, make_graph):
    from dynamicppr_spark.operators.distances import (
        seed_distances,
        seed_distances_incremental,
    )

    edges, n = fixtures.path_graph(10)
    g = make_graph(edges, n)
    prev = seed_distances(g, [0])

    # insert a shortcut 0 -> 8: warm relax must shorten 8 and 9
    ins = spark.createDataFrame(
        [("+", 0, 8)], "op string, src bigint, dst bigint"
    )
    d2, g2 = seed_distances_incremental(g, [0], prev, ins)
    want = dict(oracle.seed_distances(
        np.vstack([edges, [[0, 8]]]), n, [0]
    ))
    assert _dist_map(d2) == want and want[8] == 1 and want[9] == 2

    # delete the shortcut again: the guard recomputes cold and restores
    # the original chain distances
    dele = spark.createDataFrame(
        [("-", 0, 8)], "op string, src bigint, dst bigint"
    )
    d3, g3 = seed_distances_incremental(g2, [0], d2, dele)
    assert _dist_map(d3) == {v: v for v in range(n)}
    g3.release()


def test_seed_distance_stream_matches_cold(spark, make_graph, tmp_path):
    """Maintained stream state: insert-heavy feed through
    run_state_stream equals a cold BFS on the final graph."""
    from dynamicppr_spark.streaming.updates import (
        UPDATE_SCHEMA,
        SeedDistanceStreamState,
        run_label_stream,
    )

    edges, n = fixtures.rmat_graph(n=50, m=160, seed=5)
    rng = np.random.default_rng(9)
    cur = {tuple(e) for e in np.unique(edges, axis=0)}
    feed = tmp_path / "feed"
    feed.mkdir()
    for b in range(4):
        rows = []
        for _ in range(3):
            s, d = int(rng.integers(0, n)), int(rng.integers(0, n))
            if s != d and (s, d) not in cur:
                rows.append((b, "+", s, d))
                cur.add((s, d))
        if b == 2 and cur:  # one delete to exercise the guard mid-stream
            s, d = sorted(cur)[0]
            rows.append((b, "-", int(s), int(d)))
            cur.discard((s, d))
        spark.createDataFrame(
            rows, "batch_id bigint, op string, src bigint, dst bigint"
        ).withColumn(
            "ts", F.timestamp_seconds(F.lit(1_700_000_000 + b))
        ).coalesce(1).write.mode("append").parquet(str(feed))

    st = SeedDistanceStreamState(make_graph(edges, n), [0, 3])
    stream = spark.readStream.schema(UPDATE_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(feed))
    q = run_label_stream(st, stream, query_name="seed_dist_stream")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert st.batches_applied == 4
    final = np.array(sorted(cur), dtype=np.int64)
    assert _dist_map(st.labels) == oracle.seed_distances(final, n, [0, 3])
    st.graph.release()


def test_soak_seed_distance_stream_30_batches(spark, make_graph, tmp_path):
    """30-batch soak for the seed-distance stream state (the repo's
    long-stream discipline: every NEW maintained state gets one). The
    feed deliberately INTRODUCES NEW VERTICES — the delta-overlay chain
    growth class the dedup-stream soak caught — plus occasional deletes
    (cold-guard path). Gates: bounded persistent blocks, flat per-batch
    wall, exact final parity with a cold BFS."""
    import time

    from dynamicppr_spark.rddtrack import persistent_rdd_ids
    from dynamicppr_spark.streaming.updates import (
        UPDATE_SCHEMA,
        SeedDistanceStreamState,
        run_label_stream,
    )

    edges, n = fixtures.rmat_graph(n=60, m=240, seed=17)
    rng = np.random.default_rng(23)
    cur = {tuple(e) for e in np.unique(edges, axis=0)}
    next_vid = n  # fresh vertex ids force graph-chain growth per batch
    feed = tmp_path / "feed"
    feed.mkdir()
    for b in range(30):
        rows = []
        for _ in range(3):
            r = rng.random()
            if r < 0.25:  # attach a brand-new vertex
                s = int(rng.integers(0, n))
                rows.append((b, "+", s, next_vid))
                cur.add((s, next_vid))
                next_vid += 1
            elif r < 0.4 and cur:  # delete (cold-guard path)
                s, d = list(cur)[int(rng.integers(0, len(cur)))]
                rows.append((b, "-", int(s), int(d)))
                cur.discard((s, d))
            else:
                s, d = int(rng.integers(0, n)), int(rng.integers(0, n))
                if s != d and (s, d) not in cur:
                    rows.append((b, "+", s, d))
                    cur.add((s, d))
        spark.createDataFrame(
            rows, "batch_id bigint, op string, src bigint, dst bigint"
        ).withColumn(
            "ts", F.timestamp_seconds(F.lit(1_700_000_000 + b))
        ).coalesce(1).write.mode("append").parquet(str(feed))

    class Timed:
        def __init__(self, inner):
            self.inner, self.lat, self.blocks = inner, [], []

        def apply(self, batch_df):
            t0 = time.time()
            self.inner.apply(batch_df)
            self.lat.append(time.time() - t0)
            ids = persistent_rdd_ids(spark.sparkContext)
            self.blocks.append(len(ids) if ids is not None else 0)

    g0 = make_graph(edges, n)
    # vertex-adding batches grow the delta chain ~1 block/batch; the row
    # trigger never fires for 3-row batches, so (like the dedup stream's
    # pair graph) lower the CHAIN trigger — the soak then exercises folds
    # and the across-fold read-after-free class, and blocks must plateau
    g0.compact_max_chain_blocks = 8
    st = Timed(SeedDistanceStreamState(g0, [0, 5]))
    stream = spark.readStream.schema(UPDATE_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(feed))
    q = run_label_stream(st, stream, query_name="soak_seed_dist")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert st.inner.batches_applied == 30

    final = np.array(sorted(cur), dtype=np.int64)
    want = oracle.seed_distances(final, next_vid, [0, 5])
    assert _dist_map(st.inner.labels) == want

    q4 = max(1, len(st.blocks) // 4)
    assert max(st.blocks[-q4:]) <= max(st.blocks[:q4]) + 10, (
        st.blocks[:q4], st.blocks[-8:]
    )
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    assert med(st.lat[-q4:]) <= 3.0 * med(st.lat[:q4]) + 1.0, (
        med(st.lat[:q4]), med(st.lat[-q4:])
    )
    st.inner.graph.release()


def test_weighted_seed_distances(spark, make_graph):
    """weighted=True relaxes with edge cost w (Bellman-Ford), checked
    against the pure-Python oracle; a cheap long detour must beat an
    expensive direct hop."""
    from dynamicppr_spark.graph import LinkGraph
    from dynamicppr_spark.operators.distances import seed_distances

    rows = [
        (0, 1, 10.0),  # expensive direct hop
        (0, 2, 1.0), (2, 3, 1.0), (3, 1, 1.0),  # cheap 3-hop detour
        (1, 4, 2.5),
        (5, 0, 7.0),  # upstream of the seed: unreachable
    ]
    edf = spark.createDataFrame(rows, "src bigint, dst bigint, w double")
    g = LinkGraph(edf, num_partitions=4)
    got = {r["vid"]: r["dist"] for r in seed_distances(g, [0], weighted=True).collect()}
    assert got == {0: 0.0, 1: 3.0, 2: 1.0, 3: 2.0, 4: 5.5}
    g.release()

    rng = np.random.default_rng(3)
    e = fixtures.rmat_graph(n=60, m=260, seed=7)[0]
    w = rng.integers(1, 9, size=len(e)).astype(float)
    ew = np.column_stack([e, w])
    edf = spark.createDataFrame(
        [(int(a), int(b), float(c)) for a, b, c in ew],
        "src bigint, dst bigint, w double",
    )
    g = LinkGraph(edf, num_partitions=8)
    got = {r["vid"]: r["dist"] for r in seed_distances(g, [0, 9], weighted=True).collect()}
    # LinkGraph sums duplicate (src,dst) weights — mirror before comparing
    import collections
    agg = collections.defaultdict(float)
    for a, b, c in ew:
        agg[(int(a), int(b))] += float(c)
    merged = np.array([(a, b, w) for (a, b), w in agg.items()])
    want = oracle.weighted_seed_distances(merged, 60, [0, 9])
    assert got == want

    # unweighted graph + weighted=True is a loud error
    with pytest.raises(ValueError):
        seed_distances(make_graph(e, 60), [0], weighted=True)
    g.release()
