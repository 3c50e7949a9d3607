"""reactive_kinesis_spark — a PySpark-native analytics engine.

A brand-new engine providing the query and data-processing capabilities of
WW-Digital/reactive-kinesis (a Kinesis stream connector + reliability layer),
re-expressed Spark-first: DataFrame/SQL/Catalyst for the relational surface,
Structured Streaming for the streaming surface, plus the LLM-training-data
pipeline operators (dedup, similarity search, multimodal columns, text
analysis) a 100 TB-scale deployment needs.

Design rule (SURVEY.md §7): every operator is a ``DataFrame -> DataFrame``
function so batch and streaming share one code path and the DuckDB oracle can
verify batch semantics.
"""

from reactive_kinesis_spark.session import get_spark
from reactive_kinesis_spark.tables import TABLES, load_table, load_tables, register_views

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "__version__",
]
