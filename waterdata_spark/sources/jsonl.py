"""JSON-Lines source/sink (beyond the reference contract).

JSONL is the lingua franca of public LLM-corpus releases (one JSON
object per line — splittable, appendable, streamable). The Spark
mapping is the built-in json reader with three deliberate choices:

- **declared schema, never inference** — inference is a second full
  scan of 100 TB and silently unions divergent shapes; the engine's
  contract everywhere else (schemas.py) is explicit schemas.
- **PERMISSIVE + captured corrupt records** — real corpus dumps
  contain broken lines; FAILFAST kills a 1000-executor job on line
  one of file 40,000, DROPMALFORMED silently eats data. Capturing
  the raw line in ``_corrupt_record`` keeps the job alive AND the
  damage auditable (route it to quarantine with
  ``split_corrupt``).
- **multiLine stays False** — one object per line keeps files
  splittable; multiLine forces whole-file parsing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def jsonl_schema(schema: T.StructType) -> T.StructType:
    """The user's schema plus the corrupt-record capture column."""
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )


def read_jsonl(
    spark: SparkSession,
    path: str | list[str],
    schema: T.StructType,
    **options: str,
) -> DataFrame:
    """One row per JSON line; malformed lines survive as
    ``_corrupt_record`` (all data columns null). Column pruning and
    filter pushdown work as for any FileScan; a projection that drops
    ``_corrupt_record`` costs nothing for well-formed data."""
    reader = (
        spark.read.schema(jsonl_schema(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean rows without the capture column, quarantine rows).

    Spark requires caching/materializing before filtering on
    ``_corrupt_record`` alone (the parser short-circuits otherwise);
    selecting it together with the data columns — as here — is the
    documented safe pattern."""
    corrupt = F.col(CORRUPT_COL).isNotNull()
    return (
        df.filter(~corrupt).drop(CORRUPT_COL),
        df.filter(corrupt),
    )


def write_jsonl(df: DataFrame, path: str, mode: str = "error") -> None:
    """One JSON object per line, null fields omitted (the JSONL
    release convention — readers treat absent and null alike and the
    corpus shrinks measurably)."""
    df.write.mode(mode).option("ignoreNullFields", True).json(path)
