from btrdb_server_spark.functions.text import (
    bpe_token_stats,
    doc_fingerprint,
    lang_id,
    rolling_fingerprint,
    text_stats,
    tokens_col,
)
from btrdb_server_spark.functions.dedup import (
    exact_dedup,
    lsh_candidate_pairs,
    minhash_dedup_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from btrdb_server_spark.functions.similarity import (
    ann_topk_ivf,
    ann_topk_lsh,
    centroids_from_rows,
    cosine_topk,
    cosine_topk_by_id,
    ivf_assign,
    lsh_bucket_assignments,
    near_dup_pairs,
)
from btrdb_server_spark.functions.multimodal import (
    decode_media,
    frame_sample,
    media_from_documents,
    resize_plan,
)

__all__ = [
    "bpe_token_stats",
    "doc_fingerprint",
    "lang_id",
    "rolling_fingerprint",
    "text_stats",
    "tokens_col",
    "exact_dedup",
    "lsh_candidate_pairs",
    "minhash_dedup_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "simhash",
    "ann_topk_ivf",
    "ann_topk_lsh",
    "centroids_from_rows",
    "cosine_topk",
    "cosine_topk_by_id",
    "ivf_assign",
    "lsh_bucket_assignments",
    "near_dup_pairs",
    "decode_media",
    "frame_sample",
    "media_from_documents",
    "resize_plan",
]
