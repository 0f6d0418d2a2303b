from waterdata_spark.operators.dedup import dedup_any, exact_dedup, priority_dedup
from waterdata_spark.operators.expand import expand_keys
from waterdata_spark.operators.expectations import (
    ExpectationError,
    expect_column_consistency,
    expect_range,
    expect_row_count_preserved,
    expect_schema,
)
from waterdata_spark.operators.fallback_join import fallback_join

__all__ = [
    "dedup_any",
    "exact_dedup",
    "priority_dedup",
    "expand_keys",
    "ExpectationError",
    "expect_column_consistency",
    "expect_range",
    "expect_row_count_preserved",
    "expect_schema",
    "fallback_join",
]
