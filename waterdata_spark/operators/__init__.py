from waterdata_spark.operators.asof import asof_join
from waterdata_spark.operators.chunking import chunk_documents, pack_sequences
from waterdata_spark.operators.decontaminate import decontaminate, ngram_contamination
from waterdata_spark.operators.classify import nb_score, nb_train
from waterdata_spark.operators.clustering import KMeansModel, kmeans
from waterdata_spark.operators.dedup import (
    content_digest,
    dedup_against_exact,
    dedup_any,
    dedup_lines_global,
    dedup_spans_global,
    exact_dedup,
    priority_dedup,
    priority_dedup_agg,
    remove_boilerplate_lines,
)
from waterdata_spark.operators.embeddings import (
    PCAModel,
    fit_pca,
    fit_pca_gram,
    project_pca,
)
from waterdata_spark.operators.dedup_approx import (
    dedup_against,
    min_id_components,
    minhash_candidate_pairs,
    minhash_dedup,
    simhash_signature,
    simhash_signature_md5,
    star_contraction_components,
)
from waterdata_spark.operators.expand import expand_keys
from waterdata_spark.operators.expectations import (
    ExpectationError,
    expect_column_consistency,
    expect_range,
    expect_ranges,
    expect_row_count_preserved,
    expect_schema,
)
from waterdata_spark.operators.fallback_join import fallback_join
from waterdata_spark.operators.graph import pagerank
from waterdata_spark.operators.joins import suffixed_join
from waterdata_spark.operators.merge import apply_changes, merge_upsert
from waterdata_spark.operators.quantize import (
    dequantize,
    quantization_error,
    with_quantized_vector,
)
from waterdata_spark.operators.range_join import range_join
from waterdata_spark.operators.sampling import (
    assign_split,
    hash_sample,
    mixture_rates,
    stratified_sample,
    stratified_sample_exact,
    upsample,
)
from waterdata_spark.operators.linkage import link_pairs, linked_dedup
from waterdata_spark.operators.selection import (
    importance_resample,
    importance_weights,
    lm_perplexity,
)
from waterdata_spark.operators.retrieval import bm25_topk, rrf_fuse
from waterdata_spark.operators.semdedup import (
    assign_clusters,
    semdedup,
    semdedup_labels,
)
from waterdata_spark.operators.similarity import (
    build_ivf_index,
    cosine_search_bruteforce,
    cosine_search_ivf,
    cosine_topk_bruteforce,
    cosine_topk_ivf,
    cosine_topk_ivf_blocked,
    cosine_topk_lsh,
    search_ivf_index,
)

__all__ = [
    "ExpectationError",
    "KMeansModel",
    "PCAModel",
    "apply_changes",
    "asof_join",
    "assign_clusters",
    "bm25_topk",
    "build_ivf_index",
    "chunk_documents",
    "cosine_search_bruteforce",
    "cosine_search_ivf",
    "cosine_topk_bruteforce",
    "cosine_topk_ivf",
    "cosine_topk_ivf_blocked",
    "cosine_topk_lsh",
    "decontaminate",
    "dedup_any",
    "dedup_against",
    "content_digest",
    "dedup_against_exact",
    "dedup_lines_global",
    "dedup_spans_global",
    "dequantize",
    "exact_dedup",
    "expand_keys",
    "expect_column_consistency",
    "expect_range",
    "quantization_error",
    "expect_ranges",
    "expect_row_count_preserved",
    "expect_schema",
    "fallback_join",
    "assign_split",
    "hash_sample",
    "importance_resample",
    "link_pairs",
    "pagerank",
    "linked_dedup",
    "lm_perplexity",
    "importance_weights",
    "merge_upsert",
    "min_id_components",
    "minhash_candidate_pairs",
    "minhash_dedup",
    "mixture_rates",
    "ngram_contamination",
    "pack_sequences",
    "priority_dedup",
    "priority_dedup_agg",
    "range_join",
    "search_ivf_index",
    "simhash_signature",
    "simhash_signature_md5",
    "star_contraction_components",
    "stratified_sample",
    "stratified_sample_exact",
    "upsample",
    "suffixed_join",
    "fit_pca",
    "fit_pca_gram",
    "project_pca",
    "kmeans",
    "nb_score",
    "nb_train",
    "remove_boilerplate_lines",
    "rrf_fuse",
    "semdedup",
    "semdedup_labels",
    "with_quantized_vector",
]
