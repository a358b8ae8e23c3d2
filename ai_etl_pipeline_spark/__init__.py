"""ai_etl_pipeline_spark — a PySpark-native analytics/ETL engine with the
capability surface of ArmenMadoyan/ai-etl-pipeline (see SURVEY.md),
re-expressed Spark-first: lazy DataFrame plans, Catalyst-owned physical
strategy, broadcast enrichment joins, Structured Streaming, and
training-data-pipeline extensions (dedup, similarity search, text
analysis, multimodal plumbing).
"""

from .session import get_session

__all__ = ["get_session"]
__version__ = "0.1.0"
