from waterdata_spark.functions.cleaning import (
    clean_sentinels,
    coalesce_suffixed,
    concat_address,
    parse_us_date,
    prefix_tag,
    strip_inner_spaces,
    with_unit_column,
)
from waterdata_spark.functions.text import (
    char_shingles,
    doc_fingerprint,
    lang_id_score,
    punct_count,
    token_count,
    tokens,
)

__all__ = [
    "clean_sentinels",
    "coalesce_suffixed",
    "concat_address",
    "parse_us_date",
    "prefix_tag",
    "strip_inner_spaces",
    "with_unit_column",
    "char_shingles",
    "doc_fingerprint",
    "lang_id_score",
    "punct_count",
    "token_count",
    "tokens",
]
