"""Sources (SURVEY.md §2.1 S1–S3).

Reference behavior being re-expressed (citations into /root/reference):
- S1 CSV scan with full dtype inference: ``preprocess.py:21-24``
  (``pd.read_csv(..., low_memory=False)`` = whole-file inference). Spark
  equivalent: ``spark.read.csv(header=True, inferSchema=True)`` — the
  inference pass is distributed instead of single-process.
- S2 Excel multi-sheet scan: ``preprocess.py:17-19``
  (``pd.read_excel(sheet_name=None)`` → dict of frames). Spark has no
  built-in Excel source; sheets are small by construction (Excel caps at
  ~1M rows), so we read on the driver and promote each sheet with
  ``spark.createDataFrame`` (Arrow-accelerated).
- S3 unsupported-extension rejection: ``preprocess.py:25-26``.

At 100 TB the real source is columnar: ``read_parquet`` is the hot path —
schema comes from the footer (no inference scan), predicate pushdown and
column pruning reach the row groups, and partition discovery handles
directory-partitioned layouts for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Columnar scan — the scale path. Pushdown/pruning verified in tests
    via ``explain`` (PushedFilters / ReadSchema)."""
    return spark.read.parquet(path)


def read_parquet_nanos_ts(spark: SparkSession, path: str, ts_cols: tuple[str, ...] = ("ts",)) -> DataFrame:
    """Parquet scan tolerant of TIMESTAMP(NANOS) columns, which vanilla
    Spark rejects (PARQUET_TYPE_ILLEGAL). Reads nanos as long
    (``spark.sql.legacy.parquet.nanosAsLong``) and converts the named
    columns to microsecond timestamps — still a pushdown-capable columnar
    scan, no Python in the path."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ts_cols:
        if c in df.columns and dict(df.dtypes).get(c) == "bigint":
            # integer division — epoch-nanos (~1.7e18) overflows a double
            # mantissa, so float division here silently loses microseconds
            df = df.withColumn(c, F.expr(f"timestamp_micros(`{c}` div 1000)"))
    return df


def read_csv(spark: SparkSession, path: str, infer_schema: bool = True) -> DataFrame:
    """S1: header + whole-file dtype inference, mirroring
    ``pd.read_csv(low_memory=False)`` semantics declaratively."""
    return spark.read.csv(path, header=True, inferSchema=infer_schema)


def read_excel_sheets(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    """S2: all sheets → ``{sheet_name: DataFrame}``.

    Driver-side ``pd.read_excel(sheet_name=None)`` then promote. Excel
    data is bounded (≤ ~1M rows/sheet) so this never becomes the scale
    bottleneck; huge inputs arrive as CSV/Parquet instead. Falls back to
    the vendored stdlib SpreadsheetML reader when openpyxl is absent.
    """
    import pandas as pd

    try:
        sheets = pd.read_excel(path, sheet_name=None)
    except ImportError:
        from . import _xlsx_lite

        sheets = {
            name: pd.DataFrame(rows, columns=cols)
            for name, (cols, rows) in _xlsx_lite.read_xlsx(path).items()
        }
    out: dict[str, DataFrame] = {}
    for name, pdf in sheets.items():
        # Spark can't infer a type for all-NaN object columns; stringify
        # them so empty columns survive (P2 drops them later anyway).
        for col in pdf.columns:
            if pdf[col].isna().all():
                pdf[col] = pdf[col].astype("object")
                pdf[col] = None
        out[name] = spark.createDataFrame(pdf)
    return out


def load_source_file(spark: SparkSession, path: str) -> DataFrame | dict[str, DataFrame]:
    """Dispatch on extension, mirroring ``preprocess.py:15-26`` (S1/S2/S3)."""
    ext = os.path.splitext(path)[1].lower()
    if ext in (".xlsx", ".xls"):
        return read_excel_sheets(spark, path)
    if ext == ".csv":
        return read_csv(spark, path)
    if ext == ".parquet":
        return read_parquet(spark, path)
    raise ValueError(f"Unsupported file extension: {ext!r} (expected .csv/.xlsx/.xls/.parquet)")
