from . import clean, dedup, distinct, enrich, mapping, multimodal, relational, similarity, textstats

__all__ = [
    "clean",
    "dedup",
    "distinct",
    "enrich",
    "mapping",
    "multimodal",
    "relational",
    "similarity",
    "textstats",
]
