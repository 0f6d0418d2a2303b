from waterdata_spark.pipelines.compare import compare_pipeline
from waterdata_spark.pipelines.curate import CurationResult, curate_corpus
from waterdata_spark.pipelines.direct import direct_pipeline
from waterdata_spark.pipelines.down import down_csv_stage, down_join_stage

__all__ = [
    "CurationResult",
    "compare_pipeline",
    "curate_corpus",
    "direct_pipeline",
    "down_csv_stage",
    "down_join_stage",
]
