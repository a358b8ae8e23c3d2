"""Distinct-value extraction & sampling (SURVEY.md §2.3 A2/A3, §2.2 P11/P12).

Reference kernels:
- A2 per-column distinct over string columns with total/dup counts:
  ``/root/reference/translate.py:11-34``.
- A3 null-count-per-column: ``/root/reference/preprocess.py:42``.
- P11 head-N sample: ``/root/reference/mapper.py:139-166``.
- P12 per-column value sampling for prompts: ``/root/reference/mapper.py:47-49``.

Scale notes: the counts that only feed logs/prompts use
``approx_count_distinct`` (one pass, no shuffle-per-column); exact
``.distinct()`` frames are produced only for columns whose values feed an
external enrichment (they are then distinct-sized, i.e. small by the
semi-join-reduction argument the reference itself exploits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def string_columns(df: DataFrame) -> list[str]:
    return [f.name for f in df.schema.fields if f.dataType.simpleString() == "string"]


def column_profiles(df: DataFrame, approx: bool = True) -> dict[str, dict[str, int]]:
    """A2's counting half + A3, as ONE aggregate pass for ALL columns:
    ``{col: {total, non_null, distinct}}``. ``approx=True`` uses HLL
    sketches (±2%) — the right tradeoff when the numbers only feed logs.
    """
    if not df.columns:
        return {}
    distinct_fn = F.approx_count_distinct if approx else F.countDistinct
    aggs: list = [F.count(F.lit(1)).alias("__total")]
    for c in df.columns:
        q = F.col(f"`{c}`")
        aggs.append(F.count(q).alias(f"{c}__nn"))
        aggs.append(distinct_fn(q).alias(f"{c}__d"))
    row = df.select(*aggs).first()
    return {
        c: {"total": row["__total"], "non_null": row[f"{c}__nn"], "distinct": row[f"{c}__d"]}
        for c in df.columns
    }


def null_counts(df: DataFrame) -> dict[str, int]:
    """A3: nulls per column, single pass."""
    if not df.columns:
        return {}
    row = df.select(
        [(F.count(F.lit(1)) - F.count(F.col(f"`{c}`"))).alias(c) for c in df.columns]
    ).first()
    return {c: row[c] for c in df.columns}


def distinct_column_values(df: DataFrame, column: str) -> DataFrame:
    """A2 kernel for ONE column: trimmed, non-null, distinct values as a
    single-column DataFrame named ``value``. Stays distributed — collect
    only happens at the external-API boundary (see enrich.py)."""
    return (
        df.select(F.trim(F.col(f"`{column}`").cast("string")).alias("value"))
        .where(F.col("value").isNotNull() & (F.col("value") != ""))
        .distinct()
    )


def extract_unique_text_values(df: DataFrame, columns: list[str] | None = None) -> dict[str, list[str]]:
    """A2 end-to-end (``translate.py:11-34``): ``{column: [unique values]}``.

    Driver-collected BY DESIGN: these dicts feed external translation/LLM
    APIs, so they must reach the driver; the distinct() has already
    crushed data-scale → distinct-scale (33k values at reference scale).
    """
    cols = columns if columns is not None else string_columns(df)
    return {c: [r["value"] for r in distinct_column_values(df, c).collect()] for c in cols}


def head_sample(df: DataFrame, n: int = 2) -> dict[str, list]:
    """P11 (``mapper.py:139-166``): first-n rows as ``{col: [values]}``."""
    rows = df.limit(n).collect()
    return {c: [r[c] for r in rows] for c in df.columns}


def column_value_samples(df: DataFrame, column: str, n: int = 5) -> list[str]:
    """P12 (``mapper.py:47-49``): up to n distinct non-null values,
    stringified — the prompt-sample bound that keeps LLM cost O(1) in
    table size."""
    return [
        r["value"]
        for r in distinct_column_values(df, column).limit(n).collect()
    ]


def random_value_sample(df: DataFrame, column: str, n: int = 10, seed: int = 42) -> list[str]:
    """``translate.py:64``'s ``random.sample(values, 10)`` — as a seeded
    distributed sample over the distinct values (never collects the full
    value set first)."""
    vals = distinct_column_values(df, column)
    return [r["value"] for r in vals.orderBy(F.xxhash64("value", F.lit(seed))).limit(n).collect()]
