from btrdb_server_spark.functions.text import (
    bpe_token_stats,
    doc_fingerprint,
    lang_id,
    rolling_fingerprint,
    text_scrub,
    text_stats,
    token_freq,
    tokens_col,
)
from btrdb_server_spark.functions.dedup import (
    exact_dedup,
    lsh_candidate_pairs,
    lsh_verified_pairs,
    dedup_clusters,
    minhash_dedup_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from btrdb_server_spark.functions.similarity import (
    ann_topk_ivf,
    ann_topk_lsh,
    ann_topk_lsh_by_id,
    centroids_from_rows,
    cosine_topk,
    cosine_topk_by_id,
    ivf_assign,
    ivf_refine,
    lsh_bucket_assignments,
    near_dup_pairs,
)
from btrdb_server_spark.functions.multimodal import (
    decode_media,
    frame_sample,
    media_from_documents,
    resize_plan,
)
from btrdb_server_spark.functions.graph import (
    copurchase_edges,
    pagerank_fixed,
)
from btrdb_server_spark.functions.linalg import pca_top_component
from btrdb_server_spark.functions.sketch import (
    ams_f2,
    bloom_audit,
    cms_heavy_hitters,
    hll_distinct,
    kmv_distinct,
)
from btrdb_server_spark.functions.similarity import mips_topk, sq8_topk
from btrdb_server_spark.functions.dedup import containment_pairs
from btrdb_server_spark.functions.text import ngram_coverage, readability
from btrdb_server_spark.functions.graph import degree_assortativity

__all__ = [
    "bpe_token_stats",
    "doc_fingerprint",
    "lang_id",
    "rolling_fingerprint",
    "text_scrub",
    "text_stats",
    "token_freq",
    "tokens_col",
    "exact_dedup",
    "lsh_candidate_pairs",
    "lsh_verified_pairs",
    "dedup_clusters",
    "minhash_dedup_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "simhash",
    "ann_topk_ivf",
    "ann_topk_lsh",
    "ann_topk_lsh_by_id",
    "centroids_from_rows",
    "cosine_topk",
    "cosine_topk_by_id",
    "ivf_assign",
    "ivf_refine",
    "lsh_bucket_assignments",
    "near_dup_pairs",
    "decode_media",
    "frame_sample",
    "media_from_documents",
    "resize_plan",
    "copurchase_edges",
    "pagerank_fixed",
    "pca_top_component",
    "cms_heavy_hitters",
    "ams_f2",
    "bloom_audit",
    "hll_distinct",
    "kmv_distinct",
    "mips_topk",
    "sq8_topk",
    "containment_pairs",
    "ngram_coverage",
    "readability",
    "degree_assortativity",
]
