from .providers import (
    HeuristicProvider,
    SemanticProvider,
    classify_text_columns,
    detect_column_languages,
    propose_column_mapping,
)

__all__ = [
    "HeuristicProvider",
    "SemanticProvider",
    "classify_text_columns",
    "detect_column_languages",
    "propose_column_mapping",
]
