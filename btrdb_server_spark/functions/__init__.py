from btrdb_server_spark.functions.text import (
    doc_fingerprint,
    lang_id,
    text_stats,
    tokens_col,
)
from btrdb_server_spark.functions.dedup import (
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from btrdb_server_spark.functions.similarity import (
    cosine_topk,
    lsh_bucket_assignments,
    near_dup_pairs,
)

__all__ = [
    "doc_fingerprint",
    "lang_id",
    "text_stats",
    "tokens_col",
    "exact_dedup",
    "lsh_candidate_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "simhash",
    "cosine_topk",
    "lsh_bucket_assignments",
    "near_dup_pairs",
]
