"""Value-map enrichment (SURVEY.md §2.4, §2.8 T3–T5).

The reference applies ``{original: translated}`` dicts per column with
``df[col].map(lambda x: m.get(x, x))`` (``/root/reference/translate.py:219-224``)
— semantically a broadcast LEFT OUTER equi-join with identity fallback.
That is exactly how it is expressed here:

    df JOIN broadcast(map_df) ON trim(df[c]) == orig
    c := coalesce(translated, c)

21,775 entries max at reference scale (``cache/translated-map.json``) ≪
any broadcast threshold; at 100 TB the fact side streams through the
broadcast hash join with zero shuffle. Tiny maps (≤ ~100 entries) go
through a ``create_map`` literal instead — no join at all, pure codegen.
"""

from __future__ import annotations

import time
from itertools import chain
from typing import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LITERAL_MAP_MAX = 128  # below this, inline as a create_map literal


def value_map_to_df(spark: SparkSession, value_map: dict[str, str]) -> DataFrame:
    return spark.createDataFrame(
        [(k, v) for k, v in value_map.items()], schema="original string, translated string"
    )


def apply_value_map(
    df: DataFrame, column: str, value_map: dict[str, str], spark: SparkSession | None = None
) -> DataFrame:
    """T5: translate one column through a mapping with identity fallback.

    Row count is preserved exactly (left join on a key that is unique on
    the build side — uniqueness holds by construction of dict keys).
    """
    if column not in df.columns:  # skip-if-missing guard, translate.py:223-224
        return df
    if not value_map:
        return df
    if len(value_map) <= LITERAL_MAP_MAX:
        mapping = F.create_map([F.lit(x) for x in chain(*value_map.items())])
        return df.withColumn(column, F.coalesce(mapping[F.col(column)], F.col(column)))
    spark = spark or df.sparkSession
    map_df = value_map_to_df(spark, value_map)
    joined = df.join(F.broadcast(map_df), on=df[column] == map_df["original"], how="left")
    return joined.withColumn(column, F.coalesce(map_df["translated"], df[column])).drop(
        "original", "translated"
    )


def apply_value_maps(
    df: DataFrame, maps: dict[str, dict[str, str]], spark: SparkSession | None = None
) -> DataFrame:
    """T5 over all columns (``translate.py:219-224`` loop)."""
    for column, value_map in maps.items():
        df = apply_value_map(df, column, value_map, spark=spark)
    return df


def translate_distinct_values(
    df: DataFrame,
    columns: list[str],
    translate_batch,
    batch_size: int = 100,
) -> dict[str, dict[str, str]]:
    """T3's shape (``translate.py:78-123``): per column, collect the
    DISTINCT values (semi-join reduction — the reference's one real
    optimization) and push them through ``translate_batch(list[str]) ->
    list[str]`` in batches, building ``{col: {orig: translated}}``.

    ``translate_batch`` is a provider callable (network, LLM, or the
    deterministic offline provider in semantic/providers.py). Batching +
    throttling live in the provider, mirroring batch_size=100 / 0.15 s
    (``translate.py:98-118``). Identity fallback on provider failure.
    """
    from .distinct import distinct_column_values

    out: dict[str, dict[str, str]] = {}
    for c in columns:
        values = [r["value"] for r in distinct_column_values(df, c).collect()]
        mapping: dict[str, str] = {}
        for i in range(0, len(values), batch_size):
            batch = values[i : i + batch_size]
            try:
                translated = translate_batch(batch)
                if len(translated) != len(batch):
                    raise ValueError("provider returned wrong batch size")
            except Exception:
                translated = batch  # identity fallback, translate.py:111-116
            mapping.update(dict(zip(batch, translated)))
        out[c] = mapping
    return out
