"""DataFrame-level operators: sketch aggregation, dedup, similarity.

All operators follow one shape: JVM-native narrow transformations feed a
partial aggregate, Arrow-batched pandas stages touch only *reduced* data
(register rows or sketch blobs), and every intermediate is a mergeable
state so the same operator works in batch, tree-merge, and streaming.
"""

from hyper_spark.operators.bloom_agg import (
    bloom_by,
    bloom_collect,
    bloom_might_contain,
    bloom_prune,
)
from hyper_spark.operators.cms_agg import (
    cms_by,
    cms_collect,
    cms_estimate,
    cms_inner_product,
    cms_merge,
    heavy_hitters,
)
from hyper_spark.operators.hll_agg import (
    approx_distinct,
    cardinality_col,
    difference_card,
    intersect_card,
    sketch_by,
    sketch_collect,
    union_sketches,
)
from hyper_spark.operators.quantiles import (
    kll_by,
    quantiles_by,
    ranks_by,
    sketch_quantiles,
    sketch_ranks,
    tdigest_by,
)
from hyper_spark.operators.hll_agg import multi_sketch_by
from hyper_spark.operators.rollup import rollup_estimates, sketch_time_rollup
from hyper_spark.operators.temporal import (
    asof_join,
    calendar_fill,
    range_join,
    resample,
    rolling_features,
    sessionize,
    state_ngrams,
    transitions,
)
from hyper_spark.operators.sampling import (
    deterministic_sample,
    hash_sample,
    hash_split,
)
from hyper_spark.operators.dedup import (
    incremental_near_dedup,
    read_signature_store,
    strip_dup_spans,
    substring_dup_spans,
    write_signature_store,
)
from hyper_spark.operators.packing import chunk_stats, pack_offsets
from hyper_spark.operators.conversations import conversation_stats
from hyper_spark.operators.corpus import prepare_corpus
from hyper_spark.operators.graph import (
    cluster_stats,
    connected_components,
    near_dedup,
    semantic_dedup,
)
from hyper_spark.operators.bm25 import (
    bm25_build,
    bm25_consts,
    bm25_prune,
    bm25_score,
    bm25_topk,
)
from hyper_spark.operators.bpe import bpe_encode, bpe_merge_list, bpe_train
from hyper_spark.operators.export import export_shards, shard_assignment, shard_manifest
from hyper_spark.operators.lm import ngram_lm_score, ngram_lm_train, ppl_buckets
from hyper_spark.operators.mixing import apply_mixture, mixture_plan
from hyper_spark.operators.multimodal import (
    attach_payload_metadata,
    decode_features,
    frame_sample,
    media_decoder,
    media_info,
    video_frame_stats,
)
from hyper_spark.operators.join_profile import join_key_profile, join_profile
from hyper_spark.operators.profile import (
    category_stats,
    cooccurrence,
    numeric_drift,
    profile_table,
    vocab_divergence,
    vocab_drift,
    vocab_stats,
)
from hyper_spark.operators.anomaly import rate_gaps, rate_spikes
from hyper_spark.operators.expectations import expect, violations
from hyper_spark.operators.snapshot import (
    diff_summary,
    merge_upsert,
    snapshot_diff,
)
from hyper_spark.operators.skipping import (
    build_file_index,
    build_zone_maps,
    compact_files,
    file_candidates,
    plan_compaction,
    point_lookup,
    range_scan,
    save_zordered,
    update_file_index,
    zone_candidates,
)
from hyper_spark.operators.theta_agg import (
    theta_a_not_b_card,
    theta_containment,
    theta_by,
    theta_collect,
    theta_estimate,
    theta_intersect_card,
    theta_jaccard,
    theta_pairwise,
    theta_union,
)
from hyper_spark.operators.matrix_sketch import (
    fd_components,
    fd_covariance_diag,
    fd_merge,
    fd_project,
    fd_sketch_by,
    gram_by,
    gram_components,
    gram_covariance,
    gram_matrix,
    gram_merge,
)
from hyper_spark.operators.classifier import (
    hash_text_features,
    logreg_confusion,
    logreg_fit,
    logreg_predict,
)
from hyper_spark.operators.clustering import (
    kmeans_assign,
    kmeans_fit,
    kmeans_profile,
)
from hyper_spark.operators.quantize import (
    build_ivfpq_index,
    knn_ivfpq,
    pq_encode,
    pq_profile,
    pq_reconstruction_mse,
    pq_search,
    pq_train,
)
from hyper_spark.operators.quality import (
    c4_clean,
    gopher_filter,
    gopher_stats,
    repetition_stats,
    scrub_text,
)

__all__ = [
    "build_ivfpq_index",
    "knn_ivfpq",
    "pq_encode",
    "pq_profile",
    "pq_reconstruction_mse",
    "pq_search",
    "pq_train",
    "hash_text_features",
    "logreg_confusion",
    "logreg_fit",
    "logreg_predict",
    "kmeans_assign",
    "kmeans_fit",
    "kmeans_profile",
    "fd_sketch_by",
    "gram_by",
    "gram_components",
    "gram_covariance",
    "gram_matrix",
    "gram_merge",
    "fd_merge",
    "fd_components",
    "fd_project",
    "fd_covariance_diag",
    "bm25_build",
    "bm25_consts",
    "bm25_prune",
    "bm25_score",
    "bm25_topk",
    "bpe_train",
    "bpe_encode",
    "bpe_merge_list",
    "export_shards",
    "shard_assignment",
    "shard_manifest",
    "theta_by",
    "theta_union",
    "theta_estimate",
    "theta_collect",
    "theta_intersect_card",
    "theta_a_not_b_card",
    "theta_containment",
    "theta_jaccard",
    "theta_pairwise",
    "mixture_plan",
    "apply_mixture",
    "attach_payload_metadata",
    "decode_features",
    "frame_sample",
    "media_decoder",
    "media_info",
    "video_frame_stats",
    "ngram_lm_train",
    "ngram_lm_score",
    "ppl_buckets",
    "approx_distinct",
    "cardinality_col",
    "intersect_card",
    "difference_card",
    "sketch_by",
    "multi_sketch_by",
    "sketch_collect",
    "union_sketches",
    "cms_by",
    "cms_collect",
    "cms_estimate",
    "cms_inner_product",
    "join_key_profile",
    "join_profile",
    "numeric_drift",
    "category_stats",
    "cooccurrence",
    "profile_table",
    "vocab_divergence",
    "vocab_drift",
    "vocab_stats",
    "build_file_index",
    "build_zone_maps",
    "compact_files",
    "file_candidates",
    "plan_compaction",
    "point_lookup",
    "range_scan",
    "save_zordered",
    "update_file_index",
    "zone_candidates",
    "diff_summary",
    "merge_upsert",
    "snapshot_diff",
    "expect",
    "violations",
    "rate_gaps",
    "rate_spikes",
    "cms_merge",
    "heavy_hitters",
    "bloom_by",
    "bloom_collect",
    "bloom_might_contain",
    "bloom_prune",
    "kll_by",
    "quantiles_by",
    "ranks_by",
    "sketch_quantiles",
    "sketch_ranks",
    "tdigest_by",
    "sketch_time_rollup",
    "rollup_estimates",
    "calendar_fill",
    "resample",
    "rolling_features",
    "sessionize",
    "state_ngrams",
    "transitions",
    "asof_join",
    "range_join",
    "hash_split",
    "hash_sample",
    "deterministic_sample",
    "pack_offsets",
    "chunk_stats",
    "conversation_stats",
    "prepare_corpus",
    "connected_components",
    "near_dedup",
    "semantic_dedup",
    "substring_dup_spans",
    "strip_dup_spans",
    "scrub_text",
    "cluster_stats",
    "incremental_near_dedup",
    "write_signature_store",
    "read_signature_store",
    "repetition_stats",
    "gopher_stats",
    "gopher_filter",
    "c4_clean",
]
