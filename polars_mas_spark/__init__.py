"""polars-mas-spark: a PySpark-native Multiple Association Study engine
with the query surface of `idinsmore1/polars-mas`, re-architected for
Spark's distributed execution model, plus large-scale training-data
pipeline operators (dedup, similarity search, text analysis).
"""

from polars_mas_spark.config import MASConfig, resolve_columns
from polars_mas_spark.pipeline import run_pipeline
from polars_mas_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["MASConfig", "resolve_columns", "run_pipeline", "get_spark"]
