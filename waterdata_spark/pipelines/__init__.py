from waterdata_spark.pipelines.compare import compare_pipeline
from waterdata_spark.pipelines.direct import direct_pipeline
from waterdata_spark.pipelines.down import down_csv_stage, down_join_stage

__all__ = ["compare_pipeline", "direct_pipeline", "down_csv_stage", "down_join_stage"]
