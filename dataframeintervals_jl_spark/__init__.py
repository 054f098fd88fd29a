"""dataframeintervals_jl_spark — a PySpark-native interval-analytics engine.

A from-scratch re-expression of the query capabilities of
beacon-biosignals/DataFrameIntervals.jl (reference, read-only at
/root/reference/) on Apache Spark: interval overlap joins with
inner/left/right/full semantics, interval intersection as a computed
column, fused grouped interval-join aggregation, and equal-width window
generation — plus large-scale training-data-pipeline extensions
(dedup, similarity search, text analysis, multimodal plumbing).

Everything on the hot path is pure Spark Column expressions: Catalyst
optimizes (pushdown/pruning/codegen) and the one genuinely custom
physical strategy — the binned range join — is a DataFrame-level
rewrite that turns the theta-join into a shuffleable equi-join.
"""

from .functions.selectors import all_, between, cols, not_
from .functions.text import pii_counts, redact_pii
from .functions.spans import (
    ALLEN_RELATIONS,
    SPAN_DDL,
    SPAN_TYPE,
    allen_relation,
    make_span,
    span_contains,
    span_duration,
    span_from_ordinal,
    span_from_timestamps,
    span_intersect,
    span_iou,
    span_start,
    span_stop,
    span_to_ordinal,
    spans_overlap,
)
from .operators.asof_join import asof_join
from .operators.graph import pagerank, triangle_counts
from .operators.coalesce import (
    merge_spans,
    overlap_profile,
    span_complement,
    span_coverage,
    span_difference,
    span_gaps,
)
from .operators.dedup import (
    connected_components,
    decontaminate,
    dedup_cluster_keep,
    exact_dedup,
    exact_dedup_keep,
    jaccard_similarity_join,
    incremental_minhash_dedup,
    minhash_lsh_pairs,
    write_minhash_index,
    minhash_signatures,
    ngram_jaccard_pairs,
    shared_shingle_pairs,
    simhash,
    simhash_near_pairs,
)
from .operators.groupby_interval_join import GroupedIntervalJoin, groupby_interval_join
from .operators.interval_join import point_in_span_join
from .operators.interval_join import (
    interval_anti_join,
    interval_join,
    interval_join_by,
    interval_join_prebinned,
    interval_semi_join,
    release_join_caches,
    setup_column_names,
)
from .operators.quantile_windows import (
    data_quantile_windows,
    dfspan,
    exact_quantile_longs,
    quantile_windows,
)
from .operators.packing import (
    chunk_documents,
    pack_sequences,
    pack_sequences_greedy,
    pack_stats,
)
from .operators.sampling import (
    greedy_coverage_select,
    heavy_hitters,
    kmv_overlap_estimate,
    sample_per_group,
    deterministic_sample,
    kmv_distinct,
    hash_split,
    stratified_sample,
    topk_per_group,
    weighted_sample,
)
from .operators.bpe import apply_bpe_merges, bpe_merges_frame, learn_bpe_merges
from .operators.cdc import (
    apply_cdc,
    diff_to_changes,
    incremental_agg_update,
    snapshot_diff,
)
from .operators.tfidf import bigram_lm_score, bm25_topk, tf_idf_top_terms
from .operators.quantile_windows import split_spans
from .operators.ranking import frequency_rank
from .operators.sessionize import sessionize
from .operators.skew import salted_join
from .operators.similarity import (
    cosine_topk,
    semantic_dedup,
    semantic_dup_pairs,
    embedding_neardup_pairs,
    ivf_topk,
    ivf_pq_topk,
    ivf_pq_topk_indexed,
    ivf_topk_indexed,
    lsh_topk,
    pq_topk,
    sq8_topk,
    write_ivf_index,
    write_ivfpq_index,
)
from .operators.timeseries import (
    cusum_changepoints,
    ewma,
    hampel_despike,
    resample_interp,
    rolling_median,
    resample_locf,
    sliding_window_agg,
    time_grid,
    validity_intervals,
)
from .session import ensure_session_configs, get_spark
from .sources.sinks import (
    write_zordered,
    zorder_value,
    read_bucketed,
    write_bucketed,
    write_partitioned,
    write_sorted_spans,
    write_binned_spans,
    write_sized,
)
from .streaming import (
    stream_cusum,
    stream_hampel,
    stream_latest_by_key,
    stream_exact_dedup,
    stream_asof_enrich,
    stream_interval_join,
    stream_interval_join_full,
    stream_validity_intervals,
    stream_merge_spans,
    stream_minhash_candidates,
    stream_resample_locf,
    stream_sessionize,
    stream_sliding_agg,
    stream_tumbling_agg,
)

__all__ = [
    "SPAN_DDL",
    "SPAN_TYPE",
    "GroupedIntervalJoin",
    "all_",
    "asof_join",
    "sessionize",
    "tf_idf_top_terms",
    "deterministic_sample",
    "hash_split",
    "stratified_sample",
    "topk_per_group",
    "pack_sequences",
    "pack_sequences_greedy",
    "pack_stats",
    "overlap_profile",
    "span_complement",
    "span_coverage",
    "span_difference",
    "span_gaps",
    "between",
    "cols",
    "dfspan",
    "ensure_session_configs",
    "get_spark",
    "groupby_interval_join",
    "interval_join",
    "interval_join_by",
    "release_join_caches",
    "interval_semi_join",
    "interval_anti_join",
    "point_in_span_join",
    "merge_spans",
    "interval_join_prebinned",
    "make_span",
    "not_",
    "quantile_windows",
    "data_quantile_windows",
    "exact_quantile_longs",
    "setup_column_names",
    "span_contains",
    "span_duration",
    "span_from_ordinal",
    "span_from_timestamps",
    "span_intersect",
    "span_start",
    "span_stop",
    "span_to_ordinal",
    "spans_overlap",
    "allen_relation",
    "ALLEN_RELATIONS",
    "span_iou",
    # training-data pipeline extensions
    "cosine_topk",
    "embedding_neardup_pairs",
    "connected_components",
    "dedup_cluster_keep",
    "exact_dedup",
    "exact_dedup_keep",
    "ivf_topk",
    "lsh_topk",
    "jaccard_similarity_join",
    "minhash_lsh_pairs",
    "incremental_minhash_dedup",
    "write_minhash_index",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "simhash",
    "simhash_near_pairs",
    "decontaminate",
    "shared_shingle_pairs",
    "bm25_topk",
    "bigram_lm_score",
    "snapshot_diff",
    "apply_cdc",
    "sample_per_group",
    "heavy_hitters",
    "semantic_dedup",
    "write_zordered",
    "zorder_value",
    "frequency_rank",
    "split_spans",
    "salted_join",
    "stream_latest_by_key",
    "redact_pii",
    "pii_counts",
    "learn_bpe_merges",
    "bpe_merges_frame",
    "apply_bpe_merges",
    "incremental_agg_update",
    "triangle_counts",
    "diff_to_changes",
    "kmv_overlap_estimate",
    "hampel_despike",
    "ewma",
    "resample_interp",
    "cusum_changepoints",
    "stream_cusum",
    "greedy_coverage_select",
    "semantic_dup_pairs",
    "rolling_median",
    "stream_hampel",
    "sq8_topk",
    "pq_topk",
    "ivf_pq_topk",
    "ivf_pq_topk_indexed",
    "write_ivfpq_index",
    "ivf_topk_indexed",
    "write_ivf_index",
    "pagerank",
    "kmv_distinct",
    "weighted_sample",
    "chunk_documents",
    "time_grid",
    "resample_locf",
    "sliding_window_agg",
    "validity_intervals",
    # storage layouts
    "read_bucketed",
    "write_binned_spans",
    "write_bucketed",
    "write_partitioned",
    "write_sorted_spans",
    "write_sized",
    # streaming
    "stream_exact_dedup",
    "stream_minhash_candidates",
    "stream_asof_enrich",
    "stream_interval_join",
    "stream_interval_join_full",
    "stream_validity_intervals",
    "stream_merge_spans",
    "stream_sessionize",
    "stream_tumbling_agg",
    "stream_sliding_agg",
    "stream_resample_locf",
]

__version__ = "0.1.0"
