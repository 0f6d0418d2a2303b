"""waterdata-spark: a PySpark-native analytics engine with the query
and data-processing capabilities of the reference water-quality ETL
(sandra444/waterdata), rebuilt Spark-first (SURVEY.md).

Layout:
- session.py    SparkSession factory (AQE, UTC, broadcast thresholds)
- schemas.py    declared StructTypes + testdata loaders
- functions/    scalar cleaning + text analysis (JVM-side expressions)
- operators/    composite relational operators (fallback join,
                priority dedup, key expansion, expectations,
                similarity, approximate dedup)
- sources/      CSV / Excel / Parquet / PDF-table adapters
- pipelines/    the reference's three pipelines as DataFrame DAGs
- streaming/    Structured Streaming surface
- queries.py    oracle-checked query suite (driver contract)
"""

from waterdata_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
