from waterdata_spark.operators.dedup import dedup_any, exact_dedup, priority_dedup, priority_dedup_agg
from waterdata_spark.operators.expand import expand_keys
from waterdata_spark.operators.expectations import (
    ExpectationError,
    expect_column_consistency,
    expect_range,
    expect_ranges,
    expect_row_count_preserved,
    expect_schema,
)
from waterdata_spark.operators.asof import asof_join
from waterdata_spark.operators.dedup_approx import (
    minhash_candidate_pairs,
    minhash_dedup,
    simhash_signature,
    simhash_signature_md5,
)
from waterdata_spark.operators.fallback_join import fallback_join
from waterdata_spark.operators.joins import suffixed_join
from waterdata_spark.operators.similarity import cosine_topk_bruteforce, cosine_topk_lsh

__all__ = [
    "asof_join",
    "minhash_candidate_pairs",
    "minhash_dedup",
    "simhash_signature",
    "simhash_signature_md5",
    "suffixed_join",
    "cosine_topk_bruteforce",
    "cosine_topk_lsh",
    "dedup_any",
    "exact_dedup",
    "priority_dedup",
    "priority_dedup_agg",
    "expand_keys",
    "ExpectationError",
    "expect_column_consistency",
    "expect_range",
    "expect_ranges",
    "expect_row_count_preserved",
    "expect_schema",
    "fallback_join",
]
