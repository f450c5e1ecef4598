"""Structured Streaming surface over the dynamic-PPR path (SURVEY.md §2 S2).

An edge-update feed (batch_id, op, src, dst, ts) is consumed micro-batch ==
update-batch via ``foreachBatch``: each micro-batch calls
PPREngine.apply_updates — the same code path as the static API, so
correctness properties (metamorphic gate) carry over verbatim.

Late data: a watermark on ts bounds state; updates arriving within the
watermark are folded into their micro-batch (PPR residual injections are
commutative within a batch, so intra-batch order never matters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

UPDATE_SCHEMA = "batch_id bigint, op string, src bigint, dst bigint, ts timestamp"


def run_update_stream(
    engine,
    stream_df: DataFrame,
    watermark: str = "10 minutes",
    query_name: str = "ppr_updates",
):
    """Attach a PPREngine to a streaming update feed. Returns the query.

    ``stream_df`` must be a streaming DataFrame with UPDATE_SCHEMA columns.
    Call ``query.processAllAvailable()`` (tests) or awaitTermination (prod).
    """
    batches_seen: list[int] = []

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # within a micro-batch, apply update-batches in batch_id order
        bids = [
            r["batch_id"]
            for r in batch_df.select("batch_id").distinct().orderBy("batch_id").collect()
        ]
        for bid in bids:
            engine.apply_updates(
                batch_df.filter(F.col("batch_id") == bid).select("op", "src", "dst")
            )
            batches_seen.append(bid)

    q = (
        stream_df.withWatermark("ts", watermark)
        .writeStream.outputMode("append")
        .queryName(query_name)
        .foreachBatch(apply_batch)
        .start()
    )
    q._dynamicppr_batches_seen = batches_seen  # test hook
    return q


def run_state_stream(
    state,
    stream_df: DataFrame,
    watermark: str = "10 minutes",
    query_name: str = "state_updates",
):
    """Attach any maintained-kernel state (an object with
    ``apply(batch_df)``) to a streaming update feed.

    One shared implementation of the micro-batch == update-batch
    discipline (split each micro-batch by batch_id, apply in batch_id
    order) — TriangleStreamState, ComponentsStreamState, LPAStreamState
    and DedupStreamState all ride this; two copies of the ordering logic
    drifted once and never will again. A state declares the columns its
    ``apply`` expects via ``batch_cols`` (default: edge-update ops).
    Returns the started StreamingQuery."""
    cols = list(getattr(state, "batch_cols", ("op", "src", "dst")))

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        bids = [
            r["batch_id"]
            for r in batch_df.select("batch_id").distinct().orderBy("batch_id").collect()
        ]
        for bid in bids:
            state.apply(
                batch_df.filter(F.col("batch_id") == bid).select(*cols)
            )

    return (
        stream_df.withWatermark("ts", watermark)
        .writeStream.outputMode("append")
        .queryName(query_name)
        .foreachBatch(apply_batch)
        .start()
    )


class TriangleStreamState:
    """Maintained triangle count under a streaming edge-update feed.

    Pairs with ``run_triangle_stream``: holds (graph, count) and applies
    ``triangle_count_incremental`` per update-batch — the K6 analogue of
    PPREngine under ``run_update_stream``, so the streaming surface
    maintains the same kernels the static API does."""

    def __init__(self, graph, count: int | None = None):
        from dynamicppr_spark.operators.triangles import triangle_count

        self.graph = graph
        self.count = (
            int(triangle_count(graph).collect()[0]["n"])
            if count is None
            else int(count)
        )
        self.batches_applied = 0

    def apply(self, batch_df: DataFrame) -> int:
        from dynamicppr_spark.operators.triangles import (
            triangle_count_incremental,
        )

        new_count, g2 = triangle_count_incremental(
            self.graph, self.count, batch_df
        )
        self.graph.release(keep=g2)
        self.graph = g2
        self.count = new_count
        self.batches_applied += 1
        return new_count


def run_triangle_stream(
    state: TriangleStreamState,
    stream_df: DataFrame,
    watermark: str = "10 minutes",
    query_name: str = "triangle_updates",
):
    """K6 flavor of ``run_state_stream`` (kept as the public name)."""
    return run_state_stream(
        state, stream_df, watermark=watermark, query_name=query_name
    )


class _MaintainedLabelState:
    """Shared shape for CC/LPA maintained label tables under a stream:
    holds (graph, labels DataFrame) and applies the kernel's incremental
    function per update-batch, cutting the new labels' lineage
    (localCheckpoint) before releasing the predecessor graph — the
    maintained-state discipline every kernel here follows."""

    label_col: str = "component"

    def __init__(self, graph, labels: DataFrame | None = None):
        from dynamicppr_spark.operators.superstep import CheckpointRotator

        self.graph = graph
        # rotate the labels checkpoint: each new eager checkpoint frees the
        # PREDECESSOR's RDD blocks explicitly (and severs the origin-plan
        # chain) instead of waiting on driver GC — the same long-stream
        # discipline as every other maintained state here
        self._rot = CheckpointRotator(graph.spark)
        self.labels = self._checkpoint_owned(
            self._cold(graph) if labels is None else labels
        )
        self.batches_applied = 0

    def _checkpoint_owned(self, labels: DataFrame) -> DataFrame:
        """Rotate ``labels`` into this state's own checkpoint, then free
        the kernel-internal loop-final blocks the input was reading (the
        ``_dynppr_ckpt_ids`` ownership handle components/lpa attach) —
        without this, every batch leaks one superstep-loop block."""
        from dynamicppr_spark.rddtrack import unpersist_rdd_ids

        loop_ids = getattr(labels, "_dynppr_ckpt_ids", set())
        out = self._rot.checkpoint(labels)
        unpersist_rdd_ids(
            self.graph.spark.sparkContext, set(loop_ids) - self._rot._prev_ids
        )
        return out

    def apply(self, batch_df: DataFrame) -> DataFrame:
        new_labels, g2 = self._incremental(self.graph, self.labels, batch_df)
        new_labels = self._checkpoint_owned(new_labels)
        self.graph.release(keep=g2)
        self.graph = g2
        self.labels = new_labels
        self.batches_applied += 1
        return new_labels


class ComponentsStreamState(_MaintainedLabelState):
    """K4 maintained under a stream: insert batches warm-merge, delete
    batches take the guarded decremental path (operators/components.py)."""

    label_col = "component"

    @staticmethod
    def _cold(graph):
        from dynamicppr_spark.operators.components import connected_components

        return connected_components(graph)

    @staticmethod
    def _incremental(graph, labels, batch):
        from dynamicppr_spark.operators.components import (
            connected_components_incremental,
        )

        return connected_components_incremental(graph, labels, batch)


class LPAStreamState(_MaintainedLabelState):
    """K5 maintained under a stream: warm-started until-stable LPA (a
    stable labeling of each updated graph; equals the cold labeling when
    the structure is unperturbed — see operators/lpa.py)."""

    label_col = "label"

    @staticmethod
    def _cold(graph):
        from dynamicppr_spark.operators.lpa import label_propagation

        return label_propagation(graph, n_iter=50, until_stable=True)

    @staticmethod
    def _incremental(graph, labels, batch):
        from dynamicppr_spark.operators.lpa import (
            label_propagation_incremental,
        )

        return label_propagation_incremental(graph, labels, batch)


class SeedDistanceStreamState(_MaintainedLabelState):
    """Seed distances (operators/distances.py) maintained under a
    stream: insert batches warm-relax from the previous distance table
    (inserts only shorten distances); any delete in a batch takes the
    explicit cold-recompute guard in seed_distances_incremental.

    Feeds that keep INTRODUCING NEW VERTICES grow the graph's delta
    chain ~1 checkpoint block per batch; lower the caller-owned graph's
    ``compact_max_chain_blocks`` (the dedup stream uses 8) to trade an
    amortized O(E/N) fold for an O(N) block bound — gated by the
    30-batch soak in tests/test_distances.py."""

    label_col = "dist"

    def __init__(self, graph, seeds, dists=None):
        self._seeds = sorted({int(s) for s in seeds})
        super().__init__(graph, dists)

    def _cold(self, graph):
        from dynamicppr_spark.operators.distances import seed_distances

        return seed_distances(graph, self._seeds)

    def _incremental(self, graph, dists, batch):
        from dynamicppr_spark.operators.distances import (
            seed_distances_incremental,
        )

        return seed_distances_incremental(graph, self._seeds, dists, batch)


def run_label_stream(
    state: _MaintainedLabelState,
    stream_df: DataFrame,
    watermark: str = "10 minutes",
    query_name: str = "label_updates",
):
    """K4/K5 flavor of ``run_state_stream`` (kept as the public name)."""
    return run_state_stream(
        state, stream_df, watermark=watermark, query_name=query_name
    )


class PageRankStreamState:
    """K3 maintained under a streaming edge-update feed.

    Holds (graph, ranks): each update-batch applies the O(|batch|) delta
    overlay and re-converges the power iteration WARM-STARTED from the
    previous ranks. Power iteration has a unique fixed point, so the
    maintained ranks match a cold recompute on the final graph to the
    same tol (gated in tests); a local perturbation leaves most scores
    near-converged, so the warm loop exits in a few supersteps instead
    of a cold run's full iteration count. Completes the kernel set: every
    maintained kernel (K1/K2 via PPREngine, K3 here, K4/K5/K6, LSH dedup)
    now has a streaming surface riding ``run_state_stream``.
    """

    def __init__(self, graph, alpha: float = 0.15, tol: float = 1e-6):
        from dynamicppr_spark.operators.pagerank import pagerank
        from dynamicppr_spark.operators.superstep import CheckpointRotator

        self.graph = graph
        self.alpha = alpha
        self.tol = tol
        self._rot = CheckpointRotator(graph.spark)
        res = pagerank(graph, alpha=alpha, tol=tol, return_result=True)
        self.ranks = self._own(res)
        self.batches_applied = 0
        self.iterations = [res.iterations]  # per-run counts (test hook)

    def _own(self, res) -> DataFrame:
        """Rotate the loop's final state into this state's own checkpoint,
        freeing the loop-final blocks (the same ownership discipline as
        ``_MaintainedLabelState._checkpoint_owned``)."""
        from dynamicppr_spark.rddtrack import unpersist_rdd_ids

        out = self._rot.checkpoint(res.state)
        unpersist_rdd_ids(
            self.graph.spark.sparkContext,
            set(res.ckpt_ids) - self._rot._prev_ids,
        )
        return out

    def apply(self, batch_df: DataFrame) -> DataFrame:
        from dynamicppr_spark.operators.pagerank import pagerank

        g2 = self.graph.with_updates(batch_df)
        res = pagerank(
            g2,
            alpha=self.alpha,
            tol=self.tol,
            init_scores=self.ranks,
            return_result=True,
        )
        self.ranks = self._own(res)
        self.graph.release(keep=g2)
        self.graph = g2
        self.batches_applied += 1
        self.iterations.append(res.iterations)
        return self.ranks


DOC_STREAM_SCHEMA = "batch_id bigint, doc_id bigint, text string, ts timestamp"


class DedupStreamState:
    """Maintained MinHash-LSH dup clusters under a streaming DOCUMENT feed
    (crawl/ingest dedup: every arriving batch is clustered against the
    whole corpus seen so far).

    State per batch:
      - ``sigs``: the capped banded-signature index (band, bsig, doc_id) —
        each bucket holds its ``max_bucket`` smallest doc_ids. Only the
        buckets the batch TOUCHES are re-capped (bounded by
        |batch| x bands x max_bucket rows); the rest of the index moves
        through a broadcast anti-join — a map-side scan, never a wide
        shuffle. The new index is checkpoint-rotated (the write is
        O(index), the same cost class as the O(V) label checkpoints of
        the CC/LPA stream states; the SHUFFLED work is O(|batch|)).
      - the candidate-pair GRAPH + its component labels, maintained by an
        inner ComponentsStreamState: new pairs are '+' edge inserts, so
        cluster merges ride the warm insert-merge CC kernel — no
        recompute of old clusters.

    Per batch work: O(|batch| x bands) new signature rows, one map-side
    pass over the index, bounded-size pair extraction inside the touched
    buckets only, and insert-merge CC over the new pairs. No all-pairs,
    no O(corpus) shuffle.

    Parity: when doc_ids arrive in increasing order (ingest order), the
    final state equals the cold ``lsh_dup_clusters`` of the full corpus
    EXACTLY — caps keep smallest ids, so nothing is ever evicted and the
    streamed pair set telescopes to the batch one (gated in tests). Out
    of order, streamed clusters are a superset (pairs recorded before a
    later-evicted member keep their merge).
    """

    batch_cols = ("doc_id", "text")

    def __init__(
        self,
        spark,
        num_hashes: int = 8,
        bands: int = 4,
        k: int = 3,
        max_bucket: int = 50,
    ):
        from dynamicppr_spark.operators.superstep import CheckpointRotator

        self.spark = spark
        self.num_hashes = num_hashes
        self.bands = bands
        self.k = k
        self.max_bucket = max_bucket
        self._rot_sigs = CheckpointRotator(spark)
        self._rot_edges = CheckpointRotator(spark)
        # checkpoint blocks the inner CC graph's BASE edges read for its
        # whole lifetime (transferred out of _rot_edges at cc creation so
        # rotation can never free the base's lineage leaf)
        self._base_ids: set[int] = set()
        self.sigs = spark.createDataFrame(
            [], "band int, bsig string, doc_id bigint"
        )
        self.cc = None  # inner ComponentsStreamState over the pair graph
        self.batches_applied = 0
        self.docs_seen = 0

    def apply(self, batch_df: DataFrame) -> None:
        from dynamicppr_spark.functions.dedup import (
            banded_signatures,
            capped_band_buckets,
        )
        from dynamicppr_spark.graph import LinkGraph

        new_sigs = banded_signatures(
            batch_df,
            num_hashes=self.num_hashes,
            bands=self.bands,
            k=self.k,
        ).select("band", "bsig", "doc_id")
        # only the buckets this batch touches change; everything else is a
        # broadcast anti-join = map-side scan of the index, no shuffle.
        # touched is a-priori bounded by |batch| x bands rows.
        touched = new_sigs.select("band", "bsig").distinct()
        untouched = self.sigs.join(
            F.broadcast(touched), ["band", "bsig"], "left_anti"
        )
        recapped = capped_band_buckets(
            self.sigs.join(F.broadcast(touched), ["band", "bsig"], "left_semi")
            .unionByName(new_sigs),
            max_bucket=self.max_bucket,
        )
        # ONE index checkpoint job per batch; the rotator frees the OLD
        # index's blocks only after the new leaf materializes. Everything
        # derived below reads the NEW checkpoint — deriving pairs from
        # ``recapped`` here would re-evaluate a plan over the just-freed
        # old index (read-after-free).
        capped = self._rot_sigs.checkpoint(untouched.unionByName(recapped))
        self.sigs = capped
        # the new index's rows in touched buckets ARE the recapped rows
        # (untouched buckets were anti-joined away), bounded in size
        touched_capped = capped.join(
            F.broadcast(touched), ["band", "bsig"], "left_semi"
        )
        new_ids = batch_df.select("doc_id").distinct()
        # pairs touching at least one NEW doc live entirely inside the
        # re-capped buckets (bounded size) — join there, not over the index
        newside = touched_capped.join(F.broadcast(new_ids), "doc_id", "left_semi")
        pairs = (
            F.broadcast(
                newside.select("band", "bsig", F.col("doc_id").alias("a"))
            )
            .join(
                touched_capped.select(
                    "band", "bsig", F.col("doc_id").alias("b")
                ),
                ["band", "bsig"],
            )
            .filter(F.col("a") != F.col("b"))
            .select(
                F.least("a", "b").alias("src"),
                F.greatest("a", "b").alias("dst"),
            )
            .distinct()
        )
        # small (O(|batch| x max_bucket) worst case): checkpoint once,
        # count from the leaf, feed to CC; rotation frees last batch's copy
        pairs = self._rot_edges.checkpoint(pairs)
        self.batches_applied += 1
        self.docs_seen += new_ids.count()
        if pairs.isEmpty():
            return
        if self.cc is None:
            # the new graph's persisted base keeps lineage to THIS pairs
            # checkpoint for its lifetime — transfer the blocks out of the
            # rotator so the next batch's rotation cannot free them
            self._base_ids = set(self._rot_edges._prev_ids)
            self._rot_edges._prev_ids = set()
            pair_graph = LinkGraph(pairs)
            # every dedup batch adds NEW doc_ids (vertices), i.e. one
            # delta-chain checkpoint block per batch — fold often: the
            # pair graph holds dup pairs only (<< corpus), so an O(pairs)
            # compaction every 8 batches is cheap and keeps the
            # persistent-block count flat over unbounded feeds
            pair_graph.compact_max_chain_blocks = 8
            self.cc = ComponentsStreamState(pair_graph)
        else:
            self.cc.apply(pairs.select(F.lit("+").alias("op"), "src", "dst"))

    def clusters(self) -> DataFrame:
        """(doc_id, cluster_id, cluster_size) — same shape/semantics as the
        batch ``lsh_dup_clusters`` (every vertex of the pair graph belongs
        to a >= 2-member cluster by construction)."""
        if self.cc is None:
            return self.spark.createDataFrame(
                [], "doc_id bigint, cluster_id bigint, cluster_size bigint"
            )
        comp = self.cc.labels.select(
            F.col("vid").alias("doc_id"), F.col("component").alias("cluster_id")
        )
        sizes = comp.groupBy("cluster_id").agg(
            F.count("*").cast("bigint").alias("cluster_size")
        )
        return comp.join(sizes, "cluster_id").select(
            "doc_id", "cluster_id", "cluster_size"
        )

    def release(self) -> None:
        """Free every block this state owns: the sigs/pairs checkpoints,
        the inner pair graph's base checkpoint, and the inner CC state."""
        from dynamicppr_spark.rddtrack import unpersist_rdd_ids

        sc = self.spark.sparkContext
        unpersist_rdd_ids(sc, self._rot_sigs._prev_ids)
        unpersist_rdd_ids(sc, self._rot_edges._prev_ids)
        self._rot_sigs._prev_ids = set()
        self._rot_edges._prev_ids = set()
        if self.cc is not None:
            self.cc.graph.release()
            unpersist_rdd_ids(sc, self.cc._rot._prev_ids)
            self.cc._rot._prev_ids = set()
            self.cc = None
        unpersist_rdd_ids(sc, self._base_ids)
        self._base_ids = set()


def run_dedup_stream(
    state: DedupStreamState,
    stream_df: DataFrame,
    watermark: str = "10 minutes",
    query_name: str = "doc_dedup",
):
    """Streaming-corpus flavor of ``run_state_stream`` (document feed)."""
    return run_state_stream(
        state, stream_df, watermark=watermark, query_name=query_name
    )


class KMVStreamState:
    """Maintained KMV distinct-count sketch under a streaming feed — the
    mergeability of the sketch (functions/sketch.py: union-sort-slice of
    partials = sketch of the union) applied in time instead of space:
    each batch contributes its k smallest distinct hashes (one bounded
    Spark job via ``two_level_kmin``), merged into the running k-min set
    on the driver. The retained state is <= k 64-bit ints — O(k), not
    O(stream) — and the maintained estimate equals the cold
    ``kmv_distinct`` of everything seen (exactness gated in tests).
    The streaming "distinct users so far" monitoring surface."""

    def __init__(self, spark, col: str, k: int = 256):
        self.spark = spark
        self.col = col
        self.k = k
        self.hs: list[int] = []
        self.batches_applied = 0
        # run_state_stream reads batch_cols per-state; an instance attr
        # because the projected column is chosen at construction
        self.batch_cols = (col,)

    def apply(self, batch_df: DataFrame) -> float:
        from dynamicppr_spark.functions.sketch import _kmv_hash, two_level_kmin

        hs = batch_df.select(_kmv_hash(self.col).alias("h")).distinct()
        rows = two_level_kmin(hs, [], "h", self.k).collect()
        batch_hs = rows[0]["hs"] if rows else []
        self.hs = sorted(set(self.hs) | set(batch_hs))[: self.k]
        self.batches_applied += 1
        return self.estimate()

    def estimate(self) -> float:
        from dynamicppr_spark.functions.sketch import _HASH_SPAN

        n = len(self.hs)
        if n < self.k:
            return float(n)
        return round((self.k - 1) * _HASH_SPAN / self.hs[-1], 6)


class EmbeddingIndexStreamState:
    """Maintained IVF ANN index under a streaming embedding feed — the
    similarity-search analogue of DedupStreamState: a rolling corpus
    (crawl embeddings arriving, stale ones retired) stays searchable with
    the SAME results the batch ``ivf_topk`` would give over the current
    corpus.

    The coarse quantizer (a small (clabel, cv) frame — label centroids or
    ``kmeans_centroids``) is FIXED at construction, the standard IVF
    contract (train once, maintain the inverted lists): per-batch
    re-training would silently move every existing vector's cell. It is
    collected once (k x dim doubles, driver-sized by definition) and
    re-uploaded as one small broadcast frame per batch.

    Per batch ('+'/'-' ops over (op, vec_id, embedding)):
      - '+' vectors are assigned to their nearest cell with the batch
        ``_assign_cells`` scan — O(|batch| x n_centroids), broadcast
        centroids, per-vector window, never O(corpus);
      - touched vec_ids leave the index via a broadcast anti-join (a
        map-side scan — re-inserting an id replaces its row, '-' retires
        it; '+' wins inside one batch, the engine-wide K2 rule);
      - ONE checkpoint-rotated index write per batch (O(index) parquet-free
        localCheckpoint, the same cost class as the CC/LPA label tables).

    ``search(queries)`` ranks with the exact ``_ivf_search`` helper
    ``ivf_topk`` uses, so maintained-index results == batch results over
    the surviving corpus by construction (gated in tests, plus a 30-batch
    soak asserting bounded persistent blocks)."""

    batch_cols = ("op", "vec_id", "embedding")

    def __init__(self, spark, centroids: DataFrame):
        from dynamicppr_spark.operators.superstep import CheckpointRotator

        self.spark = spark
        self._cent_rows = sorted(
            (int(r["clabel"]), [float(x) for x in r["cv"]])
            for r in centroids.collect()
        )
        self._rot = CheckpointRotator(spark)
        self.index = spark.createDataFrame(
            [], "vec_id bigint, v array<double>, clabel bigint"
        )
        self.batches_applied = 0

    def _cents(self):
        return F.broadcast(
            self.spark.createDataFrame(
                self._cent_rows, "clabel bigint, cv array<double>"
            )
        )

    def apply(self, batch_df: DataFrame) -> None:
        from dynamicppr_spark.functions.similarity import _assign_cells

        ins = batch_df.filter(F.col("op") == "+").select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        )
        # dedup re-sent ids inside one batch: keep one row per vec_id
        # (max over the struct is deterministic; feeds the same-batch
        # '+ wins over -' rule below through the touched set)
        ins = (
            ins.groupBy("vec_id")
            .agg(F.max(F.struct("v")).alias("s"))
            .select("vec_id", F.col("s.v").alias("v"))
        )
        assigned = _assign_cells(ins, self._cents())
        touched = batch_df.select("vec_id").distinct()
        survivors = self.index.join(
            F.broadcast(touched), "vec_id", "left_anti"
        )
        self.index = self._rot.checkpoint(
            survivors.unionByName(assigned)
        )
        self.batches_applied += 1

    def search(
        self, queries: DataFrame, k: int = 5, n_probe: int = 2
    ) -> DataFrame:
        """(query_id, vec_id, cos, rank) — IVF top-k of each (query_id,
        embedding) row against the maintained index; identical ranking to
        ``ivf_topk`` with the same quantizer over the current corpus."""
        from dynamicppr_spark.functions.similarity import _ivf_search

        q = queries.select(
            "query_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("qv"),
        )
        return _ivf_search(self.index, q, self._cents(), k=k, n_probe=n_probe)

    def release(self) -> None:
        from dynamicppr_spark.rddtrack import unpersist_rdd_ids

        unpersist_rdd_ids(self.spark.sparkContext, self._rot._prev_ids)
        self._rot._prev_ids = set()


def run_embedding_stream(
    state: EmbeddingIndexStreamState,
    stream_df: DataFrame,
    watermark: str = "10 minutes",
    query_name: str = "embedding_index",
):
    """Embedding-feed flavor of ``run_state_stream``."""
    return run_state_stream(
        state, stream_df, watermark=watermark, query_name=query_name
    )


def windowed_update_stats(stream_df: DataFrame, window: str = "1 minute") -> DataFrame:
    """Watermarked tumbling-window op counts (monitoring surface)."""
    return (
        stream_df.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", window), "op")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("window.start").alias("win_start"),
            "op",
            "n",
        )
    )


class CorpusHygieneStreamState:
    """Streaming corpus-hygiene filter — the run_corpus_pipeline stages
    applied in-flight to a document feed: repetition quality gate +
    benchmark decontamination (both stateless per doc) + exact dedup
    against EVERYTHING seen so far (the stateful part).

    State is one (fp, doc_id) table of seen content fingerprints with
    their keeper, checkpoint-rotated per batch (the engine's block-
    ownership discipline — the previous index's blocks are freed as soon
    as the new leaf materializes). The eval shingle set is FIXED at
    construction, the decontamination contract: benchmarks don't drift
    with the feed. Per batch: two bounded jobs (the index checkpoint and
    the kept-count), both O(|index| + |batch|) with broadcast-sized
    batch sides — never a rescan of the stream's history text.

    Parity: per-doc gates are order-independent, and exact duplicates
    share text (hence repetition/contamination verdicts), so when
    doc_ids arrive in increasing order the final kept set EQUALS the
    cold composition repetition-gate → exact-dedup(keep min doc_id) →
    decontamination over the full corpus (gated in tests). Out of
    order, only the keeper choice differs (first arrival wins).
    """

    batch_cols = ("doc_id", "text")

    def __init__(
        self,
        spark,
        eval_docs: DataFrame | None = None,
        max_top_bigram_frac: float | None = None,
        min_distinct_ratio: float | None = None,
        max_contamination: float | None = None,
        shingle_k: int = 3,
    ):
        from dynamicppr_spark.functions.text import shingle_table
        from dynamicppr_spark.operators.superstep import CheckpointRotator

        if (eval_docs is None) != (max_contamination is None):
            raise ValueError(
                "eval_docs and max_contamination must be given together"
            )
        self.spark = spark
        self.max_top_bigram_frac = max_top_bigram_frac
        self.min_distinct_ratio = min_distinct_ratio
        self.max_contamination = max_contamination
        self.shingle_k = shingle_k
        self._rot = CheckpointRotator(spark)
        self._rot_ev = CheckpointRotator(spark)
        self.ev = None
        if eval_docs is not None:
            # one-time checkpoint; this state owns the blocks (release())
            self.ev = self._rot_ev.checkpoint(
                shingle_table(eval_docs, k=shingle_k)
                .select("shingle")
                .distinct()
            )
        self.seen = spark.createDataFrame([], "fp string, doc_id bigint")
        self.batches_applied = 0
        self.docs_in = 0
        self.docs_kept = 0

    def _gate(self, batch_df: DataFrame) -> DataFrame:
        """The stateless per-doc gates (repetition + decontamination)."""
        from dynamicppr_spark.functions.contamination import contamination
        from dynamicppr_spark.functions.repetition import repetition_stats

        kept = batch_df
        if (
            self.max_top_bigram_frac is not None
            or self.min_distinct_ratio is not None
        ):
            stats = repetition_stats(kept)
            bad = F.lit(False)
            if self.max_top_bigram_frac is not None:
                bad = bad | (
                    F.col("top_bigram_frac") > self.max_top_bigram_frac
                )
            if self.min_distinct_ratio is not None:
                bad = bad | (
                    F.col("distinct_ratio") < self.min_distinct_ratio
                )
            kept = kept.join(
                F.broadcast(stats.filter(bad).select("doc_id")),
                "doc_id",
                "left_anti",
            )
        if self.ev is not None:
            from dynamicppr_spark.functions.text import shingle_table

            sh = shingle_table(kept, k=self.shingle_k)
            frac = (
                sh.join(
                    self.ev.withColumn("_hit", F.lit(1)), "shingle", "left"
                )
                .groupBy("doc_id")
                .agg(
                    (
                        F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
                        / F.count("*")
                    ).alias("_frac")
                )
            )
            contaminated = frac.filter(
                F.col("_frac") > self.max_contamination
            ).select("doc_id")
            kept = kept.join(
                F.broadcast(contaminated), "doc_id", "left_anti"
            )
        return kept

    def apply(self, batch_df: DataFrame) -> None:
        self.docs_in += batch_df.count()
        gated = self._gate(batch_df)
        # exact dedup: keeper per fingerprint within the batch, then
        # against everything seen (broadcast the batch side — the index
        # side is the big one)
        fresh = (
            gated.select(
                F.md5(F.trim(F.lower(F.col("text")))).alias("fp"),
                F.col("doc_id").cast("bigint").alias("doc_id"),
            )
            .groupBy("fp")
            .agg(F.min("doc_id").alias("doc_id"))
        )
        # which of the batch's fingerprints are already indexed: a
        # broadcast semi-join = one map-side scan of the index (the
        # batch side is the broadcast one — never the index)
        hits = self.seen.select("fp").join(
            F.broadcast(fresh.select("fp")), "fp", "left_semi"
        )
        new = fresh.join(F.broadcast(hits), "fp", "left_anti")
        # ONE index checkpoint per batch; the rotator frees the previous
        # index's blocks only after the new leaf materializes, and the
        # kept-count reads the NEW leaf (counting `new` after rotation
        # would re-walk a plan over the just-freed old index)
        self.seen = self._rot.checkpoint(self.seen.unionByName(new))
        self.docs_kept = self.seen.count()
        self.batches_applied += 1

    def kept(self) -> DataFrame:
        """(doc_id, fp) — every document the filter has admitted."""
        return self.seen.select("doc_id", "fp")

    def release(self) -> None:
        from dynamicppr_spark.rddtrack import unpersist_rdd_ids

        sc = self.spark.sparkContext
        unpersist_rdd_ids(sc, self._rot._prev_ids)
        unpersist_rdd_ids(sc, self._rot_ev._prev_ids)
        self._rot._prev_ids = set()
        self._rot_ev._prev_ids = set()


def run_hygiene_stream(
    state: CorpusHygieneStreamState,
    stream_df: DataFrame,
    watermark: str = "10 minutes",
    query_name: str = "corpus_hygiene",
):
    """Document-feed flavor of ``run_state_stream`` for the hygiene
    filter (same micro-batch == update-batch discipline)."""
    return run_state_stream(
        state, stream_df, watermark=watermark, query_name=query_name
    )
