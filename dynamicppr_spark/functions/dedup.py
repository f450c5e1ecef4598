"""Deduplication operators over ``documents`` — exact, MinHash+LSH (+
cluster consolidation), SimHash, n-gram Jaccard (training-data pipeline
primitives).

Every operator here uses the md5 hash family (identical across engines),
so all of them — including SimHash and the LSH duplicate CLUSTERS — have
exact DuckDB SQL oracles in __spark_entry__.py.

Scale notes: the shingle explode is the big intermediate (docs x
shingles); it shuffles once on shingle for the inverted index. LSH
banding reduces the candidate-pair join from O(n^2) to near-linear: only
docs sharing a band-signature bucket are paired, and buckets are capped
at ``max_bucket``. The raw Jaccard inverted index drops shingles above a
document-frequency cap (``max_df``) before its self-join — one
boilerplate shingle shared by 10^6 docs would otherwise emit ~10^12
pairs into one reducer; the dropped set is observable via
``hot_shingles`` (never a silent cap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dynamicppr_spark.functions.text import shingle_table

# salt width for the skew-proof LSH bucket cap (see minhash_lsh_pairs):
# per-bucket reducer work is bounded by _CAP_SALTS x max_bucket ids
_CAP_SALTS = 64


def hot_shingles(
    docs: DataFrame, col: str = "text", k: int = 3, max_df: int = 10_000
) -> DataFrame:
    """(shingle, df) — shingles above the document-frequency cap that
    ngram_jaccard_pairs drops (observable, never a silent cap)."""
    sh = shingle_table(docs, col=col, k=k)
    return (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > max_df)
    )


def exact_dup_groups(docs: DataFrame, col: str = "text") -> DataFrame:
    """(fp, n_dups, keep_doc_id): md5-identical duplicate groups (size>1)."""
    norm = F.md5(F.trim(F.lower(F.col(col))))
    return (
        docs.select(F.col("doc_id"), norm.alias("fp"))
        .groupBy("fp")
        .agg(
            F.count("*").alias("n_dups"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .filter(F.col("n_dups") > 1)
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
    min_tokens: int = 3,
    max_df: int | None = 10_000,
) -> DataFrame:
    """(doc_a, doc_b, jaccard): near-dup pairs by k-shingle Jaccard.

    Inverted-index join on shingle (each shared shingle pairs two docs
    once), then |A∩B| / (|A|+|B|-|A∩B|). doc_a < doc_b. Jaccard rounded
    to 6 dp for cross-engine hash stability.

    ``max_df`` caps the inverted index: shingles appearing in more than
    ``max_df`` documents (boilerplate) are dropped BEFORE the self-join —
    a single hot shingle shared by 10^6 docs would otherwise emit ~10^12
    candidate pairs into one reducer. Jaccard is then computed over the
    capped shingle space (sizes too), a well-defined metric that both
    engines mirror. The hot-shingle count is observable via
    ``hot_shingles()``; pass ``max_df=None`` for the exact uncapped join
    (small corpora only).
    """
    eligible = docs.filter(
        F.size(F.split(F.trim(F.lower(F.col(col))), r"\s+")) >= min_tokens
    )
    sh = shingle_table(eligible, col=col, k=k)
    if max_df is not None:
        # groupBy-count has map-side partial aggregation => no hot-key
        # reducer; the hot list itself is tiny so the anti-join broadcasts
        hot = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_df)
            .select("shingle")
        )
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    docs: DataFrame, col: str = "text", num_hashes: int = 16, k: int = 3
) -> DataFrame:
    """(doc_id, sig array<string>): MinHash signature via md5 salts.

    hash_i(shingle) = md5(i || ':' || shingle); signature element i is the
    lexicographic min over the doc's shingles — a valid min-wise hash
    family and bit-identical in DuckDB (md5 + min + group by).

    Round-6: computed NARROWLY per document — ``array_min`` over an
    in-row ``transform`` per hash, on the per-doc distinct shingle array
    (text.py::_shingled). The old form exploded |docs x shingles x
    num_hashes| rows through TWO groupBy shuffles; the min over a doc's
    shingles needs no shuffle at all (guide §2.3/§2.4 — aggregate before
    you shuffle, remove shuffles outright). Values are identical: the
    same md5 set, the same per-(doc, i) minimum. The `_sh` array is bound
    as its own projection so the shingle transform is evaluated once per
    row, not once per hash (CollapseProject keeps non-cheap expressions
    single-use)."""
    from dynamicppr_spark.functions.text import _shingled

    shingled = _shingled(docs, col=col, k=k)

    def _salted(prefix):
        # one-arg closure: a two-arg lambda would make pyspark bind the
        # ARRAY INDEX to the second parameter
        return lambda s: F.md5(F.concat(F.lit(prefix), s))

    sig = F.array(
        *[
            F.array_min(F.transform(F.col("_sh"), _salted(f"{i}:")))
            for i in range(num_hashes)
        ]
    )
    return shingled.select("doc_id", sig.alias("sig"))


def banded_signatures(
    docs: DataFrame,
    col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
) -> DataFrame:
    """(doc_id, band, bsig): per-band LSH bucket signatures — the MinHash
    signature split into ``bands`` bands of num_hashes/bands rows, each
    band md5-folded into one bucket key. The uncapped banding stage of
    ``minhash_lsh_pairs``; the streaming dedup state maintains this table
    incrementally (new docs' rows are computed per batch, O(|batch|))."""
    rows = num_hashes // bands
    sig = minhash_signatures(docs, col=col, num_hashes=num_hashes, k=k)
    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                "|",
                                *[
                                    F.col("sig")[b * rows + r]
                                    for r in range(rows)
                                ],
                            )
                        ).alias("bsig"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("x"),
    ).select("doc_id", F.col("x.band").alias("band"), F.col("x.bsig").alias("bsig"))


def capped_band_buckets(banded: DataFrame, max_bucket: int = 50) -> DataFrame:
    """Keep each (band, bsig) bucket's ``max_bucket`` smallest doc_ids via
    the salted two-level aggregation (see minhash_lsh_pairs docstring for
    why this beats a window on hot buckets)."""
    lvl1 = (
        banded.withColumn("salt", F.pmod(F.col("doc_id"), F.lit(_CAP_SALTS)))
        .groupBy("band", "bsig", "salt")
        .agg(
            F.slice(
                F.array_sort(F.collect_list("doc_id")), 1, max_bucket
            ).alias("ids")
        )
    )
    return (
        lvl1.groupBy("band", "bsig")
        .agg(
            F.slice(
                F.array_sort(F.flatten(F.collect_list("ids"))), 1, max_bucket
            ).alias("ids")
        )
        .select("band", "bsig", F.explode("ids").alias("doc_id"))
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    max_bucket: int = 50,
) -> DataFrame:
    """(doc_a, doc_b, n_bands): candidate near-dup pairs via LSH banding.

    Signature split into ``bands`` bands of num_hashes/bands rows; docs
    sharing any band signature become candidates. Buckets larger than
    ``max_bucket`` are truncated to their ``max_bucket`` smallest doc_ids
    (deterministic; callers should log the count — no silent global drop).

    The truncation is a SALTED two-level aggregation, not a window: a
    ``row_number`` over (band, bsig) would sort each hot bucket in a
    single task (the round-2 skew point). Level 1 takes the per-salt
    smallest ``max_bucket`` ids (map-side combined, every task bounded by
    its salt slice); level 2 merges ``_CAP_SALTS`` arrays of at most
    ``max_bucket`` ids — O(salts x max_bucket) per bucket regardless of
    how hot the bucket is. Identical output to the window formulation
    (the DuckDB oracle keeps its row_number form).
    """
    banded = banded_signatures(
        docs, col=col, num_hashes=num_hashes, bands=bands, k=k
    )
    capped = capped_band_buckets(banded, max_bucket=max_bucket)
    a = capped.select("band", "bsig", F.col("doc_id").alias("doc_a"))
    b = capped.select("band", "bsig", F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, ["band", "bsig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("bigint").alias("n_bands"))
    )


def simhash64(docs: DataFrame, col: str = "text") -> DataFrame:
    """(doc_id, simhash): 64-bit SimHash over whitespace tokens.

    Token hash = first 16 hex chars of md5(token), split into two 32-bit
    halves (hi = chars 1-8, lo = chars 9-16) so the value is buildable on
    any engine without uint64 support; each bit votes +1/-1 weighted by
    token frequency; simhash bit b = 1 iff the vote is positive.
    Built-ins only (explode + conv + bit ops + agg), md5 hash family =>
    bit-identical in DuckDB SQL (oracle-checkable).
    """
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col(col))), r"\s+")).alias("tok"),
    )
    h = F.md5(F.col("tok"))
    th = (
        toks.groupBy("doc_id", "tok")
        .agg(F.count("*").alias("w"))
        .withColumn("hhi", F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint"))
        .withColumn("hlo", F.conv(F.substring(h, 9, 8), 16, 10).cast("bigint"))
    )
    bit = lambda b: (  # noqa: E731
        F.shiftright(F.col("hhi"), b - 32) if b >= 32 else F.shiftright(F.col("hlo"), b)
    ).bitwiseAND(F.lit(1))
    votes = th.select(
        "doc_id",
        *[
            (
                F.when(bit(b) == 1, F.col("w")).otherwise(-F.col("w"))
            ).alias(f"b{b}")
            for b in range(64)
        ],
    )
    agg = votes.groupBy("doc_id").agg(
        *[F.sum(f"b{b}").alias(f"b{b}") for b in range(64)]
    )
    sim = agg.select(
        "doc_id",
        sum(
            [
                F.when(F.col(f"b{b}") > 0, F.lit(1).cast("bigint") * (2**b if b < 63 else -(2**63))).otherwise(0)
                for b in range(64)
            ],
            F.lit(0).cast("bigint"),
        ).alias("simhash"),
    )
    return sim


def simhash_neardup_pairs(
    docs: DataFrame,
    col: str = "text",
    max_hamming: int = 3,
    bands: int = 4,
    max_bucket: int = 200,
) -> DataFrame:
    """(doc_a, doc_b, hamming): near-dup pairs by SimHash Hamming distance.

    The 64-bit simhash64 signature is split into ``bands`` contiguous
    bit-bands (4 x 16 by default); candidate pairs are docs sharing at
    least one full band (bucket equi-join, never all-pairs), then exact
    Hamming via bit_count(xor) filters to ``max_hamming``. Pigeonhole: a
    pair within Hamming distance d < bands differs in at most d bands, so
    at least one band matches exactly — recall is 100% for
    ``max_hamming <= bands - 1`` (the default 3 < 4), with no tuning.

    Band buckets whose population exceeds ``max_bucket`` are dropped
    BEFORE the self-join (same discipline as ngram_jaccard_pairs's
    max_df: a degenerate band shared by 10^6 docs would emit ~10^12
    candidates into one reducer). The drop is deterministic and mirrored
    by the DuckDB oracle; truly near-identical docs land in hot buckets
    on ALL bands only when the corpus has a massive exact-dup class,
    which exact_dup_groups removes first in the canonical pipeline.
    """
    width = 64 // bands
    mask = (1 << width) - 1
    sim = simhash64(docs, col=col)
    # arithmetic shiftright sign-extends the high bits, but the band mask
    # keeps only the low `width` bits — identical to DuckDB's (>> k) & mask
    banded = sim.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), i * width)
                    .bitwiseAND(F.lit(mask))
                    .alias(f"v{i}")
                    for i in range(bands)
                ]
            )
        ).alias("band", "val"),
    )
    hot = (
        banded.groupBy("band", "val")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > max_bucket)
        .select("band", "val")
    )
    cold = banded.join(F.broadcast(hot), ["band", "val"], "left_anti")
    a = cold.select("band", "val", F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sim_a"))
    b = cold.select("band", "val", F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sim_b"))
    return (
        a.join(b, ["band", "val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def lsh_dup_clusters(
    docs: DataFrame,
    col: str = "text",
    num_hashes: int = 8,
    bands: int = 4,
    k: int = 3,
    max_bucket: int = 50,
) -> DataFrame:
    """(doc_id, cluster_id, cluster_size): near-duplicate CLUSTERS.

    The most common real dedup workflow: LSH candidate pairs
    (minhash_lsh_pairs) are consolidated into transitive clusters with the
    engine's own connected-components kernel (operators/components.py);
    cluster_id = the cluster's minimum doc_id — which is also the
    canonical keeper document. Only docs belonging to a multi-doc cluster
    are returned. Deterministic end to end (md5 minhash family + min-label
    components), so the whole composition has an exact DuckDB oracle
    (recursive-CTE closure over the same pair SQL).
    """
    from dynamicppr_spark.graph import LinkGraph
    from dynamicppr_spark.operators.components import connected_components

    pairs = minhash_lsh_pairs(
        docs, col=col, num_hashes=num_hashes, bands=bands, k=k,
        max_bucket=max_bucket,
    )
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    g = LinkGraph(edges)  # symmetrized inside connected_components
    # the dup-pair graph is near-dup-sized (<< corpus) in practice but
    # unbounded in principle — 'auto' runs the gated driver union when it
    # fits and the distributed min-label kernel beyond (same arbitration
    # as PPR's bcsr / PageRank's local gate)
    comp = connected_components(g, mode="auto").select(
        F.col("vid").alias("doc_id"), F.col("component").alias("cluster_id")
    )
    sizes = comp.groupBy("cluster_id").agg(
        F.count("*").cast("bigint").alias("cluster_size")
    )
    out = comp.join(sizes, "cluster_id").select(
        "doc_id", "cluster_id", "cluster_size"
    )
    g.release()
    return out


def dedup_corpus(
    docs: DataFrame,
    col: str = "text",
    num_hashes: int = 8,
    bands: int = 4,
    k: int = 3,
    max_bucket: int = 50,
) -> DataFrame:
    """Surviving rows of ``docs`` after the canonical two-stage dedup.

    Stage 1 (exact): rows whose md5(trim(lower(col))) collides keep only
    the smallest doc_id — one hash aggregation (map-side combined) plus a
    semi-join back on doc_id; no windows, no skew (a 10^6-copy boilerplate
    class is one agg row).

    Stage 2 (near): MinHash-LSH clusters over the exact survivors
    (lsh_dup_clusters — banded candidates, salted bucket cap, transitive
    closure via the engine's CC kernel); every cluster member except the
    canonical minimum doc_id is removed with an anti-join.

    Output = the deduplicated corpus, original columns intact — the table
    every downstream training-data stage consumes. Deterministic end to
    end (md5 family + min-label components), so the whole pipeline has an
    exact DuckDB oracle. Anti-join side is |near-dup members| << |docs|;
    AQE broadcasts it when small, shuffles otherwise — no forced hint.
    """
    norm = F.md5(F.trim(F.lower(F.col(col))))
    keepers = (
        docs.select(F.col("doc_id"), norm.alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    survivors = docs.join(keepers, "doc_id", "left_semi")
    clusters = lsh_dup_clusters(
        survivors, col=col, num_hashes=num_hashes, bands=bands, k=k,
        max_bucket=max_bucket,
    )
    losers = clusters.filter(
        F.col("doc_id") != F.col("cluster_id")
    ).select("doc_id")
    return survivors.join(losers, "doc_id", "left_anti")


def dedup_lines(
    docs: DataFrame,
    col: str = "text",
    sep: str = "\n",
    min_docs: int = 2,
) -> DataFrame:
    """Cross-corpus repeated-line scrub (RefinedWeb/MassiveWeb line-level
    dedup): drop every line that occurs in >= ``min_docs`` DISTINCT
    documents (nav bars, cookie banners, license footers — boilerplate
    that document-level dedup never sees), reassembling each document
    from its surviving lines in original order.

      doc_id      bigint
      n_lines     bigint — lines before the scrub
      n_kept      bigint — lines surviving
      text_clean  string — surviving lines re-joined with ``sep``
                           ('' when every line was boilerplate)

    ``sep`` is a LITERAL separator (regex-escaped for the split, used
    verbatim for the re-join). Null-``col`` docs are absent from the
    output. Deterministic — md5-free, pure counting — so exactly
    DuckDB-checkable at any corpus size.

    Scale: line explode is narrow; the occurrence count is DISTINCT
    (doc_id, line) (one shuffle) then a map-side-combined hash-agg on
    line; membership removal is a left-anti equi-join on line (AQE
    broadcasts the boilerplate side when small — it is |hot lines|, not
    |corpus|); reassembly is one hash-agg keyed on doc_id whose buffer
    is bounded by that document's own line count. No windows, no driver
    collect, no per-row Python.
    """
    import re as _re

    if min_docs < 1:
        raise ValueError(f"min_docs must be >= 1, got {min_docs}")
    base = docs.filter(F.col(col).isNotNull()).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.split(F.col(col), _re.escape(sep), -1).alias("_ls"),
    )
    lines = base.select(
        "doc_id", F.posexplode("_ls").alias("pos", "line")
    )
    hot = (
        lines.select("line", "doc_id")
        .distinct()
        .groupBy("line")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") >= min_docs)
        .select("line")
    )
    kept = (
        lines.join(hot, "line", "left_anti")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_kept"),
            F.concat_ws(
                sep,
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s["line"],
                ),
            ).alias("text_clean"),
        )
    )
    return (
        base.select(
            "doc_id", F.size("_ls").cast("bigint").alias("n_lines")
        )
        .join(kept, "doc_id", "left")
        .select(
            "doc_id",
            "n_lines",
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        )
    )


def dedup_lines_sql(
    table: str, col: str = "text", sep: str = "\n", min_docs: int = 2
) -> str:
    """DuckDB oracle form of ``dedup_lines`` (same split/count/scrub/
    re-join; window-free except DuckDB's ordered string_agg)."""
    s = "chr(10)" if sep == "\n" else "'" + sep.replace("'", "''") + "'"
    return f"""
WITH b AS (SELECT doc_id, string_split({col}, {s}) AS ls
           FROM {table} WHERE {col} IS NOT NULL),
l AS (SELECT doc_id, CAST(u.i - 1 AS BIGINT) AS pos, ls[u.i] AS line
      FROM b, UNNEST(generate_series(1, len(ls))) AS u(i)),
hot AS (SELECT line FROM (SELECT line, count(DISTINCT doc_id) AS n
                          FROM l GROUP BY line) WHERE n >= {min_docs}),
k AS (SELECT doc_id, count(*) AS n_kept,
             string_agg(line, {s} ORDER BY pos) AS text_clean
      FROM l WHERE line NOT IN (SELECT line FROM hot)
      GROUP BY doc_id)
SELECT b.doc_id, CAST(len(b.ls) AS BIGINT) AS n_lines,
       CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
       coalesce(k.text_clean, '') AS text_clean
FROM b LEFT JOIN k USING (doc_id)"""


def collapse_repeated_lines(
    docs: DataFrame, col: str = "text", sep: str = "\n"
) -> DataFrame:
    """Within-document consecutive-duplicate-line collapse — the local
    half of line-level cleanup (``dedup_lines`` is the cross-corpus
    half): runs of the same line collapse to one occurrence, preserving
    order. Catches stutter loops, repeated headers and copy-paste runs
    that the cross-corpus scrub leaves alone (a line unique to one doc
    is never boilerplate, however many times it repeats locally).

      doc_id      bigint
      n_lines     bigint — lines before the collapse
      n_kept      bigint — lines after
      text_clean  string — collapsed text re-joined with ``sep``

    A pure NARROW projection — split, one index-lambda array filter,
    re-join; no explode, no shuffle, no UDF (plan-asserted in tests) —
    so at 100 TB it rides the scan for free. Null-``col`` docs are
    absent.
    """
    import re as _re

    ls = F.split(F.col(col), _re.escape(sep), -1)
    base = docs.filter(F.col(col).isNotNull()).select(
        F.col("doc_id").cast("bigint").alias("doc_id"), ls.alias("_ls")
    )
    # filter's lambda index is 0-based while element_at is 1-based, so
    # element_at(_ls, i) IS the previous element of position i
    kept = F.filter(
        F.col("_ls"),
        lambda x, i: (i == F.lit(0)) | (F.element_at(F.col("_ls"), i) != x),
    )
    return base.select(
        "doc_id",
        F.size("_ls").cast("bigint").alias("n_lines"),
        F.size(kept).cast("bigint").alias("n_kept"),
        F.concat_ws(sep, kept).alias("text_clean"),
    )


def collapse_repeated_lines_sql(
    table: str, col: str = "text", sep: str = "\n"
) -> str:
    """DuckDB oracle form of ``collapse_repeated_lines`` (1-based
    list_filter: element i-1 is the predecessor)."""
    s = "chr(10)" if sep == "\n" else "'" + sep.replace("'", "''") + "'"
    return f"""
SELECT doc_id,
       CAST(len(ls) AS BIGINT) AS n_lines,
       CAST(len(kept) AS BIGINT) AS n_kept,
       list_aggregate(kept, 'string_agg', {s}) AS text_clean
FROM (
  SELECT doc_id, ls,
         list_filter(ls, (x, i) -> i = 1 OR ls[i - 1] <> x) AS kept
  FROM (SELECT doc_id, string_split({col}, {s}) AS ls
        FROM {table} WHERE {col} IS NOT NULL))"""
