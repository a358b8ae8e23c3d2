"""Z-order clustering key: interleaving math, null/constant handling,
and the actual point — zone-map file skipping on BOTH dimensions."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from ai_etl_pipeline_spark.operators import layout
from ai_etl_pipeline_spark.sources.readers import (
    zone_map_manifest,
    zone_map_pruned_scan,
)


def test_zorder_key_interleaves_bits(spark):
    # 2 bits, 2 cols over values 0..3 (min 0, max 3 -> identity norm):
    # z(x, y) = x0<<0 | y0<<1 | x1<<2 | y1<<3  (column-major interleave)
    rows = [(x, y) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(rows, ["x", "y"])
    got = {
        (r["x"], r["y"]): r["__zkey"]
        for r in layout.zorder_key(df, ["x", "y"], bits=2).collect()
    }
    for (x, y), z in got.items():
        expect = (
            ((x >> 0) & 1) << 0
            | ((y >> 0) & 1) << 1
            | ((x >> 1) & 1) << 2
            | ((y >> 1) & 1) << 3
        )
        assert z == expect, (x, y, z, expect)


def test_zorder_key_null_and_constant(spark):
    df = spark.createDataFrame(
        [(None, 5, 7), (10, 5, 9), (20, 5, 11)], ["a", "b", "c"]
    )
    rows = {r["c"]: r["__zkey"] for r in layout.zorder_key(df, ["a", "b"], bits=4).collect()}
    # b is constant -> contributes 0 bits; NULL a normalizes to min -> 0
    assert rows[7] == 0 and rows[9] == 0
    assert rows[11] > 0


def test_zorder_key_validations(spark):
    df = spark.createDataFrame([(1, 2)], ["a", "b"])
    with pytest.raises(ValueError):
        layout.zorder_key(df, ["a"])
    with pytest.raises(ValueError):
        layout.zorder_key(df, ["a", "b"], bits=32)


def test_zorder_prunes_both_dimensions(spark):
    # two independent uniform columns; single-column sort prunes only
    # its own column, z-order prunes BOTH
    n = 4096
    df = (
        spark.range(n)
        .select(
            (F.col("id") % 64).cast("bigint").alias("a"),
            ((F.col("id") / 64).cast("bigint") % 64).alias("b"),
        )
    )
    base = tempfile.mkdtemp(prefix="zorder_test_")
    z_path = os.path.join(base, "z")
    s_path = os.path.join(base, "s")
    layout.zorder_key(df, ["a", "b"], bits=6).repartitionByRange(
        16, "__zkey"
    ).drop("__zkey").write.mode("overwrite").parquet(z_path)
    df.repartitionByRange(16, "a").write.mode("overwrite").parquet(s_path)

    def files_read(path, col):
        man = zone_map_manifest(spark, path, ["a", "b"])
        scan = zone_map_pruned_scan(spark, path, man, col, lo=0, hi=7)
        return len(scan.inputFiles()), scan.count()

    za, za_rows = files_read(z_path, "a")
    zb, zb_rows = files_read(z_path, "b")
    sa, _ = files_read(s_path, "a")
    sb, _ = files_read(s_path, "b")
    # correctness: pruning invisible to results
    assert za_rows == df.where(F.col("a") <= 7).count()
    assert zb_rows == df.where(F.col("b") <= 7).count()
    # z-order prunes BOTH dimensions; the single-column sort prunes its
    # own column best but reads EVERYTHING for the other
    assert za < 16 and zb < 16
    assert sa < 16
    assert sb == 16
    assert za + zb < sa + sb
