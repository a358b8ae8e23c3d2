from .adapters import NetworkProvider, OpenAIChatClient, RestTranslatorClient
from .providers import (
    HeuristicProvider,
    SemanticProvider,
    classify_text_columns,
    detect_column_languages,
    propose_column_mapping,
)

__all__ = [
    "HeuristicProvider",
    "NetworkProvider",
    "OpenAIChatClient",
    "RestTranslatorClient",
    "SemanticProvider",
    "classify_text_columns",
    "detect_column_languages",
    "propose_column_mapping",
]
