"""gpd_lite_toolbox_spark — PySpark-native analytics engine with the
query/data-processing capabilities of mthh/gpd_lite_toolbox, rebuilt
Spark-first (DataFrame/Catalyst; geometry as WKB + Arrow pandas UDFs).

The top-level namespace mirrors the reference's public API
(``gpd_lite_toolbox/__init__.py:7-12`` re-exports 16 functions) so a
reference user finds the same names here, each returning DataFrames
instead of GeoDataFrames. See SURVEY.md §8 for the full coverage map.
"""

from .cache import release_caches, tracked_persist  # noqa: F401
from .vector.kmeans import kmeans_assign  # noqa: F401
from .operators.cartogram import (  # noqa: F401
    dorling_radius,
    dorling_radius2,
    non_contiguous_cartogram,
    transform_cartogram,
)
from .geometry.crs import get_crs, set_crs, st_transform, to_crs  # noqa: F401
from .operators.dissolve import dissolve, dissolve_union  # noqa: F401
from .operators.explode import (  # noqa: F401
    dumb_multi_to_single,
    multi_to_single,
    multi_to_single_stats,
)
from .operators.grid import (  # noqa: F401
    gridify_data,
    make_grid,
    make_grid_cut,
    make_grid_cut_hull,
)
from .operators.isochrone import (  # noqa: F401
    access_isocrone,
    isochrone_bands,
    isochrone_polygons,
)
from .operators.joins import (  # noqa: F401
    adjacency_lists,
    find_borders,
    ftouches_byid,
    get_borders,
    intersection_part_table,
    intersection_stats_table,
    intersects_byid,
    l_shared_border,
)
from .operators.lines import match_line_cluster, match_lines  # noqa: F401
from .operators.points import (  # noqa: F401
    mean_coordinates,
    random_pts_in_polygons,
    random_pts_on_surface,
    snap_to_nearest,
)
from .operators.audit import (  # noqa: F401
    approx_distinct_report,
    approx_percentile_report,
    fk_violations,
    json_field_stats,
    predicate_violations,
    quality_report,
    uniqueness_violations,
    table_profile,
    profile_drift,
)
from .operators.cdc import apply_changes  # noqa: F401
from .operators.skew import salted_join, skew_stats  # noqa: F401
from .operators.points import knn_to_vertices  # noqa: F401
from .operators.spatial_join import bbox_join  # noqa: F401
from .operators.temporal import (  # noqa: F401
    asof_join,
    conversion_funnel,
    dau_wau,
    event_transitions,
    session_paths,
    group_trend,
    range_join_binned,
    resample_ffill,
    retention_cohorts,
)
from .operators.classify import (  # noqa: F401
    classify_equal_interval,
    classify_quantiles,
)
from .operators.zorder import (  # noqa: F401
    hilbert_key_expr,
    write_zordered,
    zorder_key_expr,
)
from .session import get_spark  # noqa: F401
from .sources.geojson import from_geojson_features, to_geojson_features  # noqa: F401
from .sources.flat import (  # noqa: F401
    read_xml,
    write_xml,
    read_csv,
    read_orc,
    write_csv,
    write_orc,
)
from .sources.jsonl import read_jsonl, write_jsonl  # noqa: F401
from .sources.sinks import (  # noqa: F401
    overwrite_partitions,
    write_geoparquet,
    write_training_shards,
)
from .sources.osrm import osrm_table_times, osrm_times_distributed  # noqa: F401
from .sources.wkt import st_aswkt, st_fromwkt  # noqa: F401
from .text.analysis import regex_token_stats  # noqa: F401
from .text.corpus import (  # noqa: F401
    build_vocab,
    chunk_documents,
    pack_sequences,
    sample_k_per_group,
    sample_to_mixture,
    shard_corpus,
    split_corpus,
    stratified_sample,
    weighted_sample,
    weighted_sample_by_group,
    tfidf_topk,
    unigram_logprob,
    bigram_pmi,
    mixture_plan,
    perplexity_buckets,
    temperature_mixture,
    token_spectrum,
    kmv_vocab_sketch,
    length_buckets,
    unigram_divergence,
    cms_heavy_hitters,
    curriculum_order,
    leakage_safe_split,
    split_expr,
    bigram_logprob,
    kn_bigram_logprob,
    fim_split,
    dsir_weights,
    quality_blend,
    epoch_expand,
)
from .text.dedup import (  # noqa: F401
    decontaminate,
    dedup_canonical,
    append_to_minhash_index,
    dup_groups,
    embedding_near_dups,
    exact_dedup,
    minhash_signatures,
    paragraph_dedup,
    semantic_dedup,
    exact_substring_spans,
    ingest_near_dups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    ngram_jaccard_prefix_pairs,
    simhash,
    simhash_band_keys,
    ngram_containment_pairs,
    semantic_decontaminate,
    split_leakage,
    word_ngram_array_expr,
    write_minhash_index,
    remove_spans,
    simhash_hamming_pairs,
    bloom_decontaminate,
    rabin_chunks,
    chunk_dedup_stats,
    repeated_ngrams,
    pair_pr,
    winnow_fingerprints,
    winnow_pairs,
)
from .text.classify import (  # noqa: F401
    hash_features,
    nb_confusion,
    score_nb,
    train_nb,
)
from .text.fuzzy import fuzzy_token_pairs  # noqa: F401
from .text.labeling import lf_diagnostics, weak_labels  # noqa: F401
from .text.pii import pii_scan, redact_expr  # noqa: F401
from .text.pipeline import (  # noqa: F401
    clean_corpus_summary,
    corpus_diff,
    curation_ledger,
    write_curation_flags_index,
    drop_reasons,
    normalize_corpus,
    normalize_text_expr,
    quality_funnel,
    remove_boilerplate_lines,
    source_overlap,
    source_quality,
)
from .text.substrate import (  # noqa: F401
    append_to_substrate,
    read_substrate,
    write_substrate,
)
from .text.classify import (  # noqa: F401
    lr_score,
    lr_train_gd,
    standardize_features,
)
from .text.search import bm25_topk, hybrid_topk, rrf_fuse  # noqa: F401
from .text.bpe import (  # noqa: F401
    bpe_encode,
    bpe_fertility,
    bpe_segment_expr,
    bpe_train,
    word_vocab,
)
from .text.unigram import (  # noqa: F401
    unigram_encode,
    unigram_fertility,
    unigram_train,
    unigram_train_em,
)
from .text.wordpiece import (  # noqa: F401
    wordpiece_encode,
    wordpiece_fertility,
    wordpiece_train,
)
from .text.analysis import (  # noqa: F401
    dup_ngram_coverage,
    fingerprint,
    gopher_rules,
    lang_id,
    quality_score,
    repetition_stats,
    script_profile,
    token_stats,
)
from .sources.maintenance import compaction_plan, file_stats  # noqa: F401
from .media.multimodal import (  # noqa: F401
    dedup_frames,
    frame_signature_expr,
    scene_changes,
    scene_signature_expr,
)
from .vector.project import random_projection  # noqa: F401
from .vector.pq import (  # noqa: F401
    ann_ivfpq_topk,
    ann_ivfpq_topk_indexed,
    ann_pq_topk,
    append_to_ivfpq_index,
    fit_ivfpq,
    write_ivfpq_index,
    default_codebooks,
    encode_pq_expr,
    fit_pq,
    pq_distortion,
)
from .sources.warc import read_warc, write_warc  # noqa: F401
from .text.web import (  # noqa: F401
    canonical_url_expr,
    extract_html_text,
    extract_links,
    extract_urls,
    html_to_text_expr,
    anchor_stats,
    hits,
    link_graph,
    pagerank,
    url_dedup,
    url_stats,
)
from .vector.ann import (  # noqa: F401
    ann_ivf_topk,
    ann_ivf_topk_indexed,
    ann_lsh_topk,
    compact_ivf_index,
    cosine_topk,
    delete_from_ivf_index,
    write_ivf_index,
)
from .vector.mmr import mmr_topk  # noqa: F401
from .vector.centroids import (  # noqa: F401
    assemble_vectors,
    embedding_outliers,
    group_centroids,
)
from .vector.mining import (  # noqa: F401
    hard_negatives,
    retrieval_metrics,
)
from .vector.quantize import dequantize_expr, quantize_int8  # noqa: F401
from .sources.geotable import read_geo_jdbc, read_geoparquet  # noqa: F401

__all__ = [
    "get_spark",
    # reference API parity (SURVEY.md §2.1)
    "match_lines",
    "match_line_cluster",
    "get_borders",
    "find_borders",
    "transform_cartogram",
    "dissolve",
    "intersects_byid",
    "multi_to_single",
    "dumb_multi_to_single",
    "snap_to_nearest",
    "read_geoparquet",
    "read_jsonl",
    "write_jsonl",
    "read_csv",
    "write_csv",
    "read_orc",
    "write_orc",
    "write_geoparquet",
    "overwrite_partitions",
    "write_training_shards",
    "read_geo_jdbc",
    "mean_coordinates",
    "non_contiguous_cartogram",
    "make_grid",
    "make_grid_cut",
    "make_grid_cut_hull",
    "gridify_data",
    "random_pts_on_surface",
    "access_isocrone",
    "isochrone_bands",
    "isochrone_polygons",
    "random_pts_in_polygons",
    "dissolve_union",
    "multi_to_single_stats",
    "intersection_stats_table",
    # CRS (SURVEY.md §1.4)
    "set_crs",
    "get_crs",
    "to_crs",
    "st_transform",
    "ann_ivf_topk",
    "ann_ivf_topk_indexed",
    "write_ivf_index",
    "clean_corpus_summary",
    # spatial-join substrate
    "bbox_join",
    "adjacency_lists",
    "ftouches_byid",
    "intersection_part_table",
    "l_shared_border",
    "dorling_radius",
    "dorling_radius2",
    # LLM-pipeline family (BASELINE.json north star)
    "exact_dedup",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "ngram_jaccard_prefix_pairs",
    "decontaminate",
    "simhash_band_keys",
    "simhash",
    "cosine_topk",
    "kmeans_assign",
    "kn_bigram_logprob",
    "release_caches",
    "tracked_persist",
    "ann_lsh_topk",
    "bm25_topk",
    "tfidf_topk",
    "pack_sequences",
    "stratified_sample",
    "weighted_sample",
    "weighted_sample_by_group",
    "sample_to_mixture",
    "shard_corpus",
    "sample_k_per_group",
    "chunk_documents",
    "build_vocab",
    "pii_scan",
    "nb_confusion",
    "fuzzy_token_pairs",
    "score_nb",
    "train_nb",
    "redact_expr",
    "remove_boilerplate_lines",
    "normalize_corpus",
    "normalize_text_expr",
    "corpus_diff",
    "extract_urls",
    "url_stats",
    "quantize_int8",
    "dequantize_expr",
    # pipeline maintenance + calibration (round-4 session 3)
    "apply_changes",
    "approx_distinct_report",
    "json_field_stats",
    "group_centroids",
    "assemble_vectors",
    "quality_funnel",
    "regex_token_stats",
    "split_corpus",
    "unigram_logprob",
    "dedup_canonical",
    "salted_join",
    "approx_percentile_report",
    "read_warc",
    "write_warc",
    "extract_html_text",
    "html_to_text_expr",
    "split_leakage",
    "exact_substring_spans",
    "append_to_minhash_index",
    "ingest_near_dups",
    "write_minhash_index",
    # temporal joins
    "asof_join",
    "range_join_binned",
    "event_transitions",
    "resample_ffill",
    "knn_to_vertices",
    # layout + audit
    "zorder_key_expr",
    "hilbert_key_expr",
    "write_zordered",
    "classify_quantiles",
    "classify_equal_interval",
    "predicate_violations",
    "fk_violations",
    "uniqueness_violations",
    "quality_report",
    # codecs / external services
    "to_geojson_features",
    "from_geojson_features",
    "st_aswkt",
    "st_fromwkt",
    "osrm_table_times",
    "osrm_times_distributed",
    # curation reports + web family (round-4 sessions 5-7)
    "hybrid_topk",
    "rrf_fuse",
    "gopher_rules",
    "dup_ngram_coverage",
    "token_stats",
    "quality_score",
    "lang_id",
    "fingerprint",
    "repetition_stats",
    "source_quality",
    "drop_reasons",
    # round-6: substrate layer + end-to-end ledger
    "curation_ledger",
    "write_curation_flags_index",
    "fim_split",
    "dsir_weights",
    "winnow_fingerprints",
    "winnow_pairs",
    "lr_train_gd",
    "lr_score",
    "standardize_features",
    "group_trend",
    "write_substrate",
    "append_to_substrate",
    "read_substrate",
    "source_overlap",
    "semantic_dedup",
    "paragraph_dedup",
    "embedding_near_dups",
    "dup_groups",
    "minhash_signatures",
    "mixture_plan",
    "temperature_mixture",
    "perplexity_buckets",
    "bigram_pmi",
    "token_spectrum",
    "extract_links",
    "link_graph",
    "canonical_url_expr",
    "url_dedup",
    "pagerank",
    "hash_features",
    "random_projection",
    "skew_stats",
    "file_stats",
    "compaction_plan",
    "read_xml",
    "write_xml",
    "bpe_train",
    "bpe_segment_expr",
    "bpe_fertility",
    "bpe_encode",
    "word_vocab",
    # tokenizer + similarity-search breadth (round-7 session 2)
    "unigram_fertility",
    "unigram_encode",
    "unigram_train",
    "unigram_train_em",
    "wordpiece_encode",
    "wordpiece_fertility",
    "wordpiece_train",
    "mmr_topk",
    # sketch/profile/layout breadth (round-4 session 8)
    "kmv_vocab_sketch",
    "length_buckets",
    "script_profile",
    "semantic_decontaminate",
    "anchor_stats",
    "ngram_containment_pairs",
    "word_ngram_array_expr",
    "unigram_divergence",
    "dedup_frames",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "ann_ivfpq_topk_indexed",
    "write_ivfpq_index",
    "append_to_ivfpq_index",
    "fit_pq",
    "fit_ivfpq",
    "encode_pq_expr",
    "pq_distortion",
    "frame_signature_expr",
    # dedup/sketch/curation breadth (round-4 session 9)
    "remove_spans",
    "simhash_hamming_pairs",
    "bloom_decontaminate",
    "cms_heavy_hitters",
    "curriculum_order",
    "weak_labels",
    "lf_diagnostics",
    "embedding_outliers",
    "hard_negatives",
    "hits",
    "leakage_safe_split",
    "rabin_chunks",
    "chunk_dedup_stats",
    "bigram_logprob",
    "quality_blend",
    "conversion_funnel",
    "retention_cohorts",
    "repeated_ngrams",
    "table_profile",
    "retrieval_metrics",
    "epoch_expand",
    "session_paths",
    "pair_pr",
    "dau_wau",
    "profile_drift",
    "scene_changes",
]
__version__ = "0.1.0"
