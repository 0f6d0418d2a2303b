from waterdata_spark.sources.bucketed import read_table, write_bucketed
from waterdata_spark.sources.csv import read_csv, read_csv_multi
from waterdata_spark.sources.excel import read_excel_sheet, read_excel_sheets
from waterdata_spark.sources.layout import (
    skipping_stats,
    write_sorted,
    write_zordered,
    zorder_value,
)
from waterdata_spark.sources.shards import (
    append_training_shards,
    read_training_shards,
    with_shard,
    write_training_shards,
)
from waterdata_spark.sources.sink import checkpoint_parquet, write_csv, write_parquet

__all__ = [
    "append_training_shards",
    "read_training_shards",
    "with_shard",
    "write_training_shards",
    "read_csv",
    "read_csv_multi",
    "read_excel_sheet",
    "read_excel_sheets",
    "read_table",
    "checkpoint_parquet",
    "skipping_stats",
    "write_bucketed",
    "write_csv",
    "write_parquet",
    "write_sorted",
    "write_zordered",
    "zorder_value",
]
