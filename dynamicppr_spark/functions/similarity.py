"""Similarity search over the ``embeddings`` table (vec_id, embedding
array<float>, label).

Baseline: brute-force cosine top-k — pure built-ins (zip_with/aggregate
dot product inside whole-stage codegen), DuckDB-oracle-checkable.
Scale path: LSH-bucketed ANN — deterministic random-hyperplane signatures
via a seeded numpy matrix broadcast into a vectorized pandas UDF; only
vectors sharing a signature bucket are compared (near-linear vs O(n^2)).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import LongType


# embedding dimension per DataFrame — a probe (`first()`) is one driver
# job; the dimension is a property of the input, so cache like the driver's
# _MIN_VID_CACHE. Weak keys: an entry dies with its DataFrame, so a
# recycled object identity can never serve a stale dimension.
import weakref

_DIM_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def with_unit_norm(emb: DataFrame, col: str = "embedding") -> DataFrame:
    """+ unit: L2-normalized copy of the embedding (double precision)."""
    dbl = F.transform(F.col(col), lambda x: x.cast("double"))
    return emb.withColumn(
        "unit", F.transform(dbl, lambda x: x / F.nullif(_norm(dbl), F.lit(0.0)))
    )


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame | None = None,
    k: int = 5,
    n_queries: int = 10,
) -> DataFrame:
    """(query_id, vec_id, cos, rank): brute-force cosine top-k.

    ``queries`` defaults to the ``n_queries`` lowest vec_ids. Self-match
    excluded. cos rounded to 6 dp for cross-engine comparison stability.
    Brute force is the CORRECTNESS baseline; at scale use lsh_topk.
    """
    e = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    if queries is None:
        queries = e.orderBy("vec_id").limit(n_queries)
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    pairs = F.broadcast(q).crossJoin(e).filter(
        F.col("query_id") != F.col("vec_id")
    )
    scored = pairs.select(
        "query_id",
        "vec_id",
        F.round(
            _dot(F.col("qv"), F.col("v"))
            / (_norm(F.col("qv")) * _norm(F.col("v"))),
            6,
        ).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def md5_planes(n_planes: int, dim: int) -> np.ndarray:
    """Deterministic hyperplanes from the md5 hash family (no RNG seed):
    ``p[j, d-1] = int(md5(f"{j}:{d}")[:8], 16) / 2^31 - 1`` — uniform in
    [-1, 1), ``d`` 1-based to match SQL array indexing. Same device as
    the MinHash md5 salt family (functions/dedup.py): any engine with
    md5 reproduces the planes bit-identically, which is what makes the
    ANN query DuckDB-oracle-checkable."""
    import hashlib

    out = np.empty((n_planes, dim))
    for j in range(n_planes):
        for d in range(1, dim + 1):
            h = hashlib.md5(f"{j}:{d}".encode()).hexdigest()[:8]
            out[j, d - 1] = int(h, 16) / 2**31 - 1
    return out


def hyperplane_signatures(
    emb: DataFrame, dim: int, n_planes: int = 12
) -> DataFrame:
    """(vec_id, bucket): random-hyperplane LSH signature as a bigint.

    Planes are the md5-derived matrix (``md5_planes``) captured in the
    UDF closure (small: n_planes x dim doubles) — Arrow-vectorized
    batches, no per-row Python. Sign bits use double-precision dots, so
    the SQL oracle's ``sum(CAST(embedding[d] AS DOUBLE) * p)`` agrees
    exactly up to summation order (a flip needs |dot| ~ 1e-15).
    """
    planes = md5_planes(n_planes, dim)

    @F.pandas_udf(LongType())
    def signature(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy()).astype(np.float64)  # (batch, dim)
        bits = (mat @ planes.T) > 0  # (batch, n_planes)
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        return pd.Series(bits.astype(np.int64) @ weights)

    return emb.select("vec_id", signature(F.col("embedding")).alias("bucket"))


def label_centroids(emb: DataFrame) -> DataFrame:
    """(label, cv array<double>) — per-label mean embedding, rounded.

    Exact DECIMAL accumulation then round(6) per position (the same
    cross-engine determinism device as embedding_centroids): the centroid
    table is tiny (n_labels x dim) and broadcast everywhere it is used."""
    ex = emb.select("label", F.posexplode("embedding").alias("pos", "val"))
    per = ex.groupBy("label", "pos").agg(
        F.round(
            F.sum(F.col("val").cast("double").cast("decimal(18,9)"))
            .cast("double")
            / F.count("*"),
            6,
        ).alias("c")
    )
    return (
        per.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("s"))
        .select("label", F.col("s.c").alias("cv"))
    )


def _cos(a, b):
    return F.round(_dot(a, b) / (_norm(a) * _norm(b)), 6)


def _assign_cells(e: DataFrame, cents) -> DataFrame:
    """(vec_id, v, clabel): nearest-centroid assignment by rounded cosine
    (ties: clabel asc). ``cents`` is a (clabel, cv) frame, broadcast by
    the caller; one O(n * n_centroids) scan + a per-vector window — no
    global window, no shuffle wider than the vec_id hash."""
    scored = e.crossJoin(cents).select(
        "vec_id", "v", "clabel", _cos(F.col("v"), F.col("cv")).alias("ccos")
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("clabel"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", "clabel")
    )


def kmeans_centroids(
    emb: DataFrame,
    n_iters: int = 5,
    init: DataFrame | None = None,
) -> DataFrame:
    """(clabel, cv array<double>): Lloyd-iterated coarse quantizer for
    ``ivf_topk``, as a Spark dataflow.

    Each iteration: assign = the same broadcast-centroid scan + per-vector
    window ``ivf_topk`` uses for cell assignment (O(n * k), distributed);
    update = groupBy(cell, pos) DECIMAL-exact mean, rounded to 6 dp (the
    label_centroids determinism device). Between iterations the centroid
    table — O(k * dim), driver-sized BY DEFINITION, exactly what Spark
    MLlib's KMeans collects per step — round-trips through the driver,
    which both seeds the next broadcast and keeps the loop free of plan
    growth. Cells that lose every vector keep their previous centroid.

    ``init`` defaults to the deterministic per-label mean centroids, so
    with a labeled corpus the whole training run is deterministic; on an
    unlabeled 100 TB corpus pass any seed frame (e.g. a hashed sample)."""
    spark = emb.sparkSession
    e = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    seed = (
        init
        if init is not None
        else label_centroids(emb).select(F.col("label").alias("clabel"), "cv")
    )
    cent_rows = {
        int(r["clabel"]): [float(x) for x in r["cv"]] for r in seed.collect()
    }
    schema = "clabel bigint, cv array<double>"
    for _ in range(n_iters):
        cdf = spark.createDataFrame(
            sorted(cent_rows.items()), schema
        )
        asn = _assign_cells(e, F.broadcast(cdf))
        per = asn.select(
            "clabel", F.posexplode("v").alias("pos", "val")
        ).groupBy("clabel", "pos").agg(
            F.round(
                F.sum(F.col("val").cast("decimal(18,9)")).cast("double")
                / F.count("*"),
                6,
            ).alias("c")
        )
        new = (
            per.groupBy("clabel")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("s"))
            .select("clabel", F.col("s.c").alias("cv"))
        )
        for r in new.collect():
            cent_rows[int(r["clabel"])] = [float(x) for x in r["cv"]]
    return spark.createDataFrame(sorted(cent_rows.items()), schema)


def ivf_topk(
    emb: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    n_queries: int = 10,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """(query_id, vec_id, cos, rank): IVF-style ANN top-k.

    Coarse quantizer = the per-label mean centroids (deterministic, no
    trained state — which is what makes the whole query exactly
    DuckDB-oracle-checkable, unlike k-means). Every vector is ASSIGNED to
    its nearest centroid by rounded cosine (ties: label asc); a query
    probes its ``n_probe`` nearest centroids and ranks only the vectors
    assigned to those cells — the candidate set is ~n_probe/n_centroids
    of the corpus instead of all of it.

    Scale shape: the centroid table is broadcast (tiny); assignment is
    one O(n * n_centroids) scan with a per-vector window (partitioned by
    vec_id — no global window); the candidate join is an equi-join on the
    cell label. ``centroids`` swaps in a trained quantizer — e.g.
    ``kmeans_centroids(emb)`` — without touching the dataflow (the (clabel,
    cv) contract is all that is shared)."""
    cents = F.broadcast(
        centroids
        if centroids is not None
        else label_centroids(emb).select(F.col("label").alias("clabel"), "cv")
    )
    e = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    asn = _assign_cells(e, cents)
    q = e.orderBy("vec_id").limit(n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    return _ivf_search(asn, q, cents, k=k, n_probe=n_probe)


def _ivf_search(
    asn: DataFrame, q: DataFrame, cents, k: int, n_probe: int
) -> DataFrame:
    """(query_id, vec_id, cos, rank): probe + rank over an existing cell
    index. ``asn`` is the (vec_id, v, clabel) assignment table, ``q`` the
    (query_id, qv) query batch (small, broadcast), ``cents`` the broadcast
    (clabel, cv) quantizer. Shared by ``ivf_topk`` (index built in the
    same plan) and the maintained streaming index
    (streaming/updates.py::EmbeddingIndexStreamState), so both surfaces
    rank identically by construction."""
    probe_scored = F.broadcast(q).crossJoin(cents).select(
        "query_id", "qv", "clabel", _cos(F.col("qv"), F.col("cv")).alias("ccos")
    )
    w_probe = Window.partitionBy("query_id").orderBy(
        F.desc("ccos"), F.asc("clabel")
    )
    probes = (
        probe_scored.withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "qv", "clabel")
    )
    cand = F.broadcast(probes).join(asn, "clabel").filter(
        F.col("query_id") != F.col("vec_id")
    )
    scored = cand.select(
        "query_id", "vec_id", _cos(F.col("qv"), F.col("v")).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.35,
    n_planes: int = 8,
    dim: int | None = None,
    max_bucket: int = 10_000,
    info: dict | None = None,
) -> DataFrame:
    """(a, b, cos): unordered near-duplicate vector pairs — rounded cosine
    >= ``threshold`` among vectors sharing an LSH bucket. The
    embedding-modality near-dup detector (the brief's 'embedding-cosine
    near-dup'): its pairs feed the same CC-based cluster consolidation as
    the text LSH path (functions/dedup.py::dup_clusters).

    Scale shape: ONE signature per vector (md5-plane family — exactly
    SQL-reproducible, so the query is DuckDB-oracle-checkable), pair
    candidates via a bucket self-equi-join — near-linear, never all-pairs.
    Each vector lives in exactly one bucket, so no pair is emitted twice
    (no distinct needed). Approximate by design: a true near-dup pair
    hashed into different buckets is missed; more planes => smaller
    buckets => cheaper but lower recall (band the signature for higher
    recall, as the MinHash path does).

    Skew guard: a degenerate bucket is O(|bucket|^2) pairs, so buckets
    larger than ``max_bucket`` are DROPPED — deterministic, mirrored in
    the SQL oracle, and observable: pass ``info`` to receive
    ``hot_buckets``/``dropped_vectors`` counts (one extra job, gated like
    the components diagnostics — silent truncation is the failure mode)."""
    if dim is None:
        dim = _DIM_CACHE.get(emb)
        if dim is None:
            dim = len(emb.select("embedding").first()[0])
            _DIM_CACHE[emb] = dim
    sig = hyperplane_signatures(emb, dim, n_planes=n_planes)
    e = emb.join(sig, "vec_id").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        "bucket",
    )
    sizes = e.groupBy("bucket").agg(F.count("*").alias("n"))
    ok = sizes.filter(F.col("n") <= max_bucket).select("bucket")
    if info is not None:
        hot = sizes.filter(F.col("n") > max_bucket).agg(
            F.count("*").alias("hb"), F.coalesce(F.sum("n"), F.lit(0)).alias("dv")
        ).collect()[0]
        info.update(hot_buckets=int(hot["hb"]), dropped_vectors=int(hot["dv"]))
    kept = e.join(ok, "bucket", "left_semi")
    x = kept.select(
        F.col("vec_id").alias("a"), F.col("v").alias("va"), "bucket"
    )
    y = kept.select(
        F.col("vec_id").alias("b"), F.col("v").alias("vb"), "bucket"
    )
    return (
        x.join(y, "bucket")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", _cos(F.col("va"), F.col("vb")).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


def lsh_topk(
    emb: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    n_queries: int = 10,
    dim: int | None = None,
) -> DataFrame:
    """(query_id, vec_id, cos, rank): ANN top-k within LSH buckets.

    Approximate: recall depends on n_planes (fewer planes => bigger
    buckets => higher recall, more compute). The bucket equi-join replaces
    the brute-force cross join — this is the 100 TB path.

    Pass ``dim`` when the caller knows it (the driver queries do) — the
    dimension probe is otherwise one extra ``first()`` job, cached per
    DataFrame so repeated calls on the same frame pay it once.
    """
    if dim is None:
        dim = _DIM_CACHE.get(emb)
        if dim is None:
            dim = len(emb.select("embedding").first()[0])
            _DIM_CACHE[emb] = dim
    sig = hyperplane_signatures(emb, dim, n_planes=n_planes)
    e = emb.join(sig, "vec_id").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        "bucket",
    )
    q = (
        e.orderBy("vec_id")
        .limit(n_queries)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            "bucket",
        )
    )
    pairs = F.broadcast(q).join(e, "bucket").filter(
        F.col("query_id") != F.col("vec_id")
    )
    scored = pairs.select(
        "query_id",
        "vec_id",
        F.round(
            _dot(F.col("qv"), F.col("v"))
            / (_norm(F.col("qv")) * _norm(F.col("v"))),
            6,
        ).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
