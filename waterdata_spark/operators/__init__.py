from waterdata_spark.operators.asof import asof_join
from waterdata_spark.operators.bloom import (
    BloomFilter,
    bloom_build,
    bloom_merge,
    with_bloom_contains,
)
from waterdata_spark.operators.chunking import (
    bin_manifest,
    chunk_documents,
    chunk_documents_sentences,
    pack_offsets,
    pack_sequences,
    pack_sequences_bfd,
)
from waterdata_spark.operators.decontaminate import decontaminate, ngram_contamination
from waterdata_spark.operators.classify import (
    LRModel,
    lr_score,
    lr_train,
    nb_score,
    nb_train,
)
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
from waterdata_spark.operators.content import content_blocks, extract_main_content
from waterdata_spark.operators.diff import dataset_diff
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
from waterdata_spark.operators.sketches import (
    count_min_build,
    count_min_lookup,
    count_min_merge,
    count_min_might_contain,
    estimate_hll_profile,
    estimate_hll_profile_grouped,
    hll_profile,
    hll_profile_grouped,
    merge_hll_profiles,
    merge_hll_profiles_grouped,
)
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
    cap_per_group,
    assign_split,
    hash_sample,
    mixture_rates,
    stratified_sample,
    stratified_sample_exact,
    upsample,
)
from waterdata_spark.operators.linkage import link_pairs, linked_dedup
from waterdata_spark.operators.mining import mine_hard_negatives
from waterdata_spark.operators.selection import (
    importance_resample,
    importance_weights,
    lm_perplexity,
    quantile_buckets,
)
from waterdata_spark.operators.bpe import (
    encode_bpe,
    train_bpe,
    word_counts,
)
from waterdata_spark.operators.retrieval import bm25_topk, rrf_fuse
from waterdata_spark.operators.unigram_lm import (
    UnigramModel,
    encode_unigram,
    train_unigram,
)
from waterdata_spark.operators.urlfilter import (
    registered_domains_psl,
    url_blocklist_filter,
)
from waterdata_spark.operators.vocab import (
    Vocab,
    alphabet_of,
    bpe_vocab,
    decode_ids,
    encode_bpe_ids,
    encode_unigram_ids,
    pack_bins_ids,
    unigram_vocab,
)
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
    "apply_changes",
    "asof_join",
    "assign_clusters",
    "assign_split",
    "bin_manifest",
    "bloom_build",
    "bloom_merge",
    "BloomFilter",
    "bm25_topk",
    "build_ivf_index",
    "with_bloom_contains",
    "cap_per_group",
    "chunk_documents",
    "chunk_documents_sentences",
    "content_blocks",
    "content_digest",
    "extract_main_content",
    "cosine_search_bruteforce",
    "cosine_search_ivf",
    "cosine_topk_bruteforce",
    "cosine_topk_ivf",
    "cosine_topk_ivf_blocked",
    "cosine_topk_lsh",
    "dataset_diff",
    "count_min_build",
    "count_min_lookup",
    "count_min_merge",
    "count_min_might_contain",
    "decontaminate",
    "dedup_against",
    "dedup_against_exact",
    "dedup_any",
    "dedup_lines_global",
    "dedup_spans_global",
    "dequantize",
    "encode_bpe",
    "exact_dedup",
    "expand_keys",
    "expect_column_consistency",
    "expect_range",
    "expect_ranges",
    "expect_row_count_preserved",
    "expect_schema",
    "ExpectationError",
    "estimate_hll_profile",
    "estimate_hll_profile_grouped",
    "hll_profile",
    "hll_profile_grouped",
    "merge_hll_profiles",
    "merge_hll_profiles_grouped",
    "fallback_join",
    "fit_pca",
    "fit_pca_gram",
    "hash_sample",
    "importance_resample",
    "importance_weights",
    "kmeans",
    "KMeansModel",
    "link_pairs",
    "linked_dedup",
    "lm_perplexity",
    "merge_upsert",
    "min_id_components",
    "mine_hard_negatives",
    "minhash_candidate_pairs",
    "minhash_dedup",
    "mixture_rates",
    "LRModel",
    "lr_score",
    "lr_train",
    "nb_score",
    "nb_train",
    "ngram_contamination",
    "pack_offsets",
    "pack_sequences",
    "pack_sequences_bfd",
    "pagerank",
    "quantile_buckets",
    "PCAModel",
    "priority_dedup",
    "priority_dedup_agg",
    "project_pca",
    "quantization_error",
    "range_join",
    "remove_boilerplate_lines",
    "rrf_fuse",
    "registered_domains_psl",
    "url_blocklist_filter",
    "UnigramModel",
    "encode_unigram",
    "train_unigram",
    "search_ivf_index",
    "semdedup",
    "semdedup_labels",
    "simhash_signature",
    "simhash_signature_md5",
    "star_contraction_components",
    "stratified_sample",
    "stratified_sample_exact",
    "suffixed_join",
    "train_bpe",
    "upsample",
    "with_quantized_vector",
    "word_counts",
    "Vocab",
    "alphabet_of",
    "bpe_vocab",
    "decode_ids",
    "encode_bpe_ids",
    "encode_unigram_ids",
    "pack_bins_ids",
    "unigram_vocab",
]
