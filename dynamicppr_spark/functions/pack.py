"""Sequence packing: concat-and-chunk documents into fixed-size
training windows.

LLM pretraining pipelines concatenate the token stream of the whole
corpus in a deterministic order and cut it into fixed ``capacity``-token
context windows ("packs"); a document that straddles a boundary is split
across consecutive packs. The output here is the pack manifest — one row
per (pack, document-slice) — which a downstream tokenizer/writer turns
into actual training shards.

Scale design (the 100 TB path):
- The only global state is the exclusive running sum of token counts in
  doc-id order. A single global window would funnel the corpus through
  one task, so the prefix sum is two-level like the dense vertex-id
  assignment (sources/repo_files.py::assign_vertex_ids): RANGE-bucket by
  doc_id (monotone, so bucket-major order == global doc-id order),
  per-bucket window cumsums run in parallel, and only ``num_buckets``
  per-bucket totals reach the driver to form the bucket offsets
  (broadcast back as a tiny join).
- Everything else is narrow: one projection to token counts (pushes the
  two-column read to the scan), one explode of at most
  ``ntok/capacity + 1`` pack rows per document.
- Integer-only arithmetic end to end, so the manifest is bit-identical
  across engines; ``pack_chunks_sql`` emits the DuckDB oracle form used
  by the driver correctness check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from dynamicppr_spark.functions.text import _tokens


def pack_chunks(
    docs: DataFrame,
    capacity: int,
    col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 64,
) -> DataFrame:
    """Assign documents to fixed-``capacity`` token packs (concat-and-chunk).

    Documents are laid out in ``id_col`` order in one conceptual token
    stream (whitespace tokens, matching ``with_token_counts``); pack ``p``
    owns stream positions ``[p*capacity, (p+1)*capacity)``. Returns one
    row per (pack, doc) overlap:

      pack_id     bigint — the training window index
      doc_id      bigint — the contributing document
      slice_start bigint — first token of the doc inside this pack
      slice_len   bigint — number of the doc's tokens in this pack

    ``sum(slice_len)`` over a doc's rows equals its token count; every
    pack except the last sums to exactly ``capacity``.
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    if num_buckets <= 0:
        raise ValueError(f"num_buckets must be positive, got {num_buckets}")

    # The tokenizing projection is the expensive part at scale (it reads
    # the full text column); persist its tiny (doc_id, ntok) output so the
    # max-id probe and the bucket totals share ONE corpus scan. The cache
    # is released before returning (this function owns it — the repo's
    # every-persist-has-an-owner rule), so the consumer's action re-runs
    # the projection once: 2 corpus scans total instead of the naive 3.
    t = (
        docs.filter(F.col(col).isNotNull())
        .select(
            F.col(id_col).cast("bigint").alias("doc_id"),
            F.size(_tokens(col)).cast("bigint").alias("ntok"),
        )
        .filter(F.col("ntok") > 0)
        .persist()
    )

    max_id = t.agg(F.max("doc_id").alias("m")).first()["m"]
    spark = docs.sparkSession
    if max_id is None:
        t.unpersist()
        return spark.createDataFrame(
            [],
            schema=(
                "pack_id bigint, doc_id bigint, "
                "slice_start bigint, slice_len bigint"
            ),
        )
    # Range buckets keep bucket-major order identical to global doc-id
    # order, so the two-level prefix sum reproduces the single-stream one.
    span = max(1, (max_id + num_buckets) // num_buckets)
    b = t.withColumn("_b", F.expr(f"CAST(doc_id DIV {span} AS INT)"))

    w = (
        Window.partitionBy("_b")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = b.withColumn(
        "_pre", F.coalesce(F.sum("ntok").over(w), F.lit(0))
    )

    counts = {
        r["_b"]: r["tot"]
        for r in b.groupBy("_b").agg(F.sum("ntok").alias("tot")).collect()
    }
    t.unpersist()
    offsets, acc = [], 0
    for bk in sorted(counts):
        offsets.append((bk, acc))
        acc += counts[bk]
    off_df = F.broadcast(
        spark.createDataFrame(offsets, schema="_b int, _off bigint")
    )

    pos = (
        local.join(off_df, "_b")
        .withColumn("start", F.col("_off") + F.col("_pre"))
        .withColumn("end", F.col("start") + F.col("ntok"))
    )
    cap = int(capacity)
    return (
        pos.withColumn(
            "pack_id",
            F.explode(
                F.sequence(
                    F.expr(f"start DIV {cap}"), F.expr(f"(end - 1) DIV {cap}")
                )
            ),
        )
        .select(
            F.col("pack_id").cast("bigint").alias("pack_id"),
            "doc_id",
            F.greatest(
                F.lit(0).cast("bigint"),
                F.col("pack_id") * cap - F.col("start"),
            ).alias("slice_start"),
            (
                F.least(F.col("end"), (F.col("pack_id") + 1) * cap)
                - F.greatest(F.col("start"), F.col("pack_id") * cap)
            )
            .cast("bigint")
            .alias("slice_len"),
        )
    )


def pack_text(
    docs: DataFrame,
    capacity: int,
    col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 64,
) -> DataFrame:
    """Materialize each pack's actual token content (the shard payload).

    Joins the ``pack_chunks`` manifest back to the corpus, slices each
    document's token array to its in-pack span, and assembles the pack in
    doc-id order. Returns one row per pack:

      pack_id   bigint — the training window index
      pack_text string — the pack's tokens joined by a single space
      n_docs    bigint — documents contributing to this pack
      n_tokens  bigint — token count (== capacity for all but the last)

    Scale: the manifest→corpus join is a keyed equi-join (AQE picks the
    strategy); the per-pack assembly buffer is bounded by ``capacity``
    tokens regardless of corpus size, and within-pack order comes from an
    array_sort over at most that many (doc_id, slice) structs — no window
    over the corpus.
    """
    manifest = pack_chunks(docs, capacity, col, id_col, num_buckets)
    toks = (
        docs.filter(F.col(col).isNotNull())
        .select(
            F.col(id_col).cast("bigint").alias("doc_id"),
            _tokens(col).alias("_t"),
        )
        .filter(F.size("_t") > 0)
    )
    sliced = manifest.join(toks, "doc_id").select(
        "pack_id",
        "doc_id",
        F.array_join(
            F.slice("_t", F.col("slice_start") + 1, F.col("slice_len")), " "
        ).alias("_s"),
        "slice_len",
    )
    return sliced.groupBy("pack_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("doc_id", "_s"))),
                lambda x: x["_s"],
            ),
            " ",
        ).alias("pack_text"),
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("slice_len").cast("bigint").alias("n_tokens"),
    )


def pack_text_sql(table: str, capacity: int) -> str:
    """DuckDB oracle form of ``pack_text``."""
    cap = int(capacity)
    return f"""
WITH t AS (
  SELECT doc_id::BIGINT AS doc_id,
         string_split_regex(trim(lower(text)), '\\s+') AS tk,
         len(string_split_regex(trim(lower(text)), '\\s+'))::BIGINT AS ntok
  FROM {table}
  WHERE text IS NOT NULL
), w AS (
  SELECT doc_id, tk, ntok,
         COALESCE(SUM(ntok) OVER (
           ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0)::BIGINT AS start
  FROM t
  WHERE ntok > 0
), s AS (
  SELECT p.pack_id::BIGINT AS pack_id,
         doc_id,
         array_to_string(list_slice(tk,
           greatest(0, p.pack_id * {cap} - start) + 1,
           greatest(0, p.pack_id * {cap} - start)
             + (least(start + ntok, (p.pack_id + 1) * {cap})
                - greatest(start, p.pack_id * {cap}))), ' ') AS sl,
         (least(start + ntok, (p.pack_id + 1) * {cap})
          - greatest(start, p.pack_id * {cap}))::BIGINT AS slice_len
  FROM w,
    UNNEST(generate_series(start // {cap}, (start + ntok - 1) // {cap}))
      AS p(pack_id)
)
SELECT pack_id,
       string_agg(sl, ' ' ORDER BY doc_id) AS pack_text,
       count(*)::BIGINT AS n_docs,
       sum(slice_len)::BIGINT AS n_tokens
FROM s GROUP BY pack_id
"""


def pack_chunks_sql(table: str, capacity: int) -> str:
    """DuckDB oracle form of ``pack_chunks`` (global window — fine at
    oracle scale; the Spark side uses the two-level prefix sum)."""
    cap = int(capacity)
    return f"""
WITH t AS (
  SELECT doc_id::BIGINT AS doc_id,
         len(string_split_regex(trim(lower(text)), '\\s+'))::BIGINT AS ntok
  FROM {table}
  WHERE text IS NOT NULL
), w AS (
  SELECT doc_id, ntok,
         COALESCE(SUM(ntok) OVER (
           ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0)::BIGINT AS start
  FROM t
  WHERE ntok > 0
)
SELECT p.pack_id::BIGINT AS pack_id,
       doc_id,
       greatest(0, p.pack_id * {cap} - start)::BIGINT AS slice_start,
       (least(start + ntok, (p.pack_id + 1) * {cap})
        - greatest(start, p.pack_id * {cap}))::BIGINT AS slice_len
FROM w,
  UNNEST(generate_series(start // {cap}, (start + ntok - 1) // {cap}))
    AS p(pack_id)
"""
