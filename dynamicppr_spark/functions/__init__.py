"""Training-data pipeline operators: text analysis, dedup, similarity
search, multimodal plumbing (SURVEY.md §2e "training-data ops")."""

from dynamicppr_spark.functions.dedup import (
    exact_dup_groups,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash64,
)
from dynamicppr_spark.functions.similarity import cosine_topk, lsh_topk
from dynamicppr_spark.functions.text import (
    with_fingerprint,
    with_lang_id,
    with_quality_score,
    with_token_counts,
)

__all__ = [
    "exact_dup_groups",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "simhash64",
    "cosine_topk",
    "lsh_topk",
    "with_fingerprint",
    "with_lang_id",
    "with_quality_score",
    "with_token_counts",
]
