"""The engine's Python-edge surface: Arrow-vectorized pandas UDFs
(SURVEY.md §2.8 — the reference's UDFs are eager driver-side Python; here
the sanctioned escape hatch is pandas_udf / applyInPandas, never
row-at-a-time Python).

Everything expressible with built-ins stays JVM-side; these exist for
kernels that genuinely need numpy/pandas semantics and as templates for
plugging model inference into a plan.

UDFs are created lazily (pandas_udf return-type parsing needs an active
SparkSession, so decorating at import time breaks library imports).
"""

from __future__ import annotations

from functools import lru_cache

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf


@lru_cache(maxsize=None)
def _weighted_mean():
    def weighted_mean(v: pd.Series, w: pd.Series) -> float:
        denom = w.sum()
        return float((v * w).sum() / denom) if denom else float("nan")

    return pandas_udf(weighted_mean, "double")


def weighted_mean_udaf(value_col, weight_col):
    """Grouped-agg pandas UDF: weighted mean of value by weight
    (Arrow-batched, one vectorized call per group)."""
    return _weighted_mean()(value_col, weight_col)


@lru_cache(maxsize=None)
def _normalize_text():
    def normalize(s: pd.Series) -> pd.Series:
        return s.str.lower().str.replace(r"\s+", " ", regex=True).str.strip()

    return pandas_udf(normalize, "string")


def normalize_text_udf(col):
    """Scalar pandas UDF: vectorized lowercase + collapse-whitespace (a
    stand-in for tokenizer/model preprocessing that needs Python)."""
    return _normalize_text()(col)


def grouped_zscore(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """applyInPandas template: per-group standardization — the grouped-map
    shape used for per-entity model scoring. One Arrow exchange per group
    batch; output schema declared up front."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType(list(df.schema.fields) + [StructField("zscore", DoubleType())])

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf[value_col].std(ddof=1)
        mean = pdf[value_col].mean()
        pdf = pdf.copy()
        pdf["zscore"] = (pdf[value_col] - mean) / std if std and std > 0 else 0.0
        return pdf

    return df.groupBy(group_col).applyInPandas(score, schema=schema)


def cogrouped_ratio(
    left: DataFrame, right: DataFrame, key_col: str, out_key: str = "key"
) -> DataFrame:
    """Cogrouped applyInPandas template: the two relations are grouped
    on the same key and each (left-batch, right-batch) pair arrives as
    two pandas frames — the shape for per-entity reconciliation /
    model-join logic that SQL can't express row-wise. Here the kernel is
    deliberately SQL-equivalent (per-key counts + ratio) so the DuckDB
    oracle can verify the plumbing exactly."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField(out_key, LongType()),
            StructField("n_left", LongType()),
            StructField("n_right", LongType()),
            StructField("ratio", DoubleType()),
        ]
    )

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        key = lpdf[key_col].iloc[0] if len(lpdf) else rpdf[key_col].iloc[0]
        nl, nr = len(lpdf), len(rpdf)
        return pd.DataFrame(
            {
                out_key: [int(key)],
                "n_left": [nl],
                "n_right": [nr],
                "ratio": [round(nl / nr, 6) if nr else None],
            }
        )

    return (
        left.groupBy(key_col)
        .cogroup(right.groupBy(key_col))
        .applyInPandas(merge, schema=schema)
    )
