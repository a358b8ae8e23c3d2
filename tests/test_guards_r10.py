"""Round-10 ADVICE regression guards.

Each test pins one of the r9 ADVICE findings:
  - count-min probe params are validated in BOTH directions via the
    declared cms_depth/cms_width columns (distinct.py),
  - zorder_key survives an all-NULL column (null-safe constant guard)
    and a > 1.4e14 value range (decimal-widened normalization),
  - cohort_retention uses FLOOR division for week indices, so
    pre-epoch days do not fold into week 0.
"""

import datetime

import pytest
from pyspark.sql import functions as F

from ai_etl_pipeline_spark.operators import behavior, distinct, layout


def test_countmin_probe_width_too_large_raises(spark):
    items = spark.createDataFrame([(f"t{i}",) for i in range(50)], ["token"])
    sketch = distinct.countmin_rollup(items, [], [], "token", depth=3, width=64)
    assert {"cms_depth", "cms_width"} <= set(sketch.columns)
    with pytest.raises(ValueError, match="width"):
        # width LARGER than the rollup's: pre-r10 this passed the
        # max-bucket heuristic and silently returned est_count=0
        distinct.countmin_estimate(sketch, items, "token", depth=3, width=128)
    with pytest.raises(ValueError, match="width"):
        distinct.countmin_estimate(sketch, items, "token", depth=3, width=32)
    with pytest.raises(ValueError, match="depth"):
        distinct.countmin_estimate(sketch, items, "token", depth=2, width=64)


def test_countmin_inner_product_width_mismatch_raises(spark):
    items = spark.createDataFrame([(f"t{i}",) for i in range(50)], ["token"])
    s64 = distinct.countmin_rollup(items, [], [], "token", depth=3, width=64)
    s128 = distinct.countmin_rollup(items, [], [], "token", depth=3, width=128)
    with pytest.raises(ValueError, match="widths differ"):
        distinct.countmin_inner_product(s64, s128)


def test_countmin_estimate_still_overestimates_with_declared_params(spark):
    rows = [("a",)] * 7 + [("b",)] * 3 + [(f"x{i}",) for i in range(20)]
    df = spark.createDataFrame(rows, ["item"])
    sketch = distinct.countmin_rollup(df, [], [], "item", depth=3, width=64)
    items = spark.createDataFrame([("a",), ("b",)], ["item"])
    got = {
        r["item"]: r["est_count"]
        for r in distinct.countmin_estimate(
            sketch, items, "item", depth=3, width=64
        ).collect()
    }
    assert got["a"] >= 7 and got["b"] >= 3


def test_zorder_key_all_null_column_yields_nonnull_keys(spark):
    df = spark.createDataFrame(
        [(i, None) for i in range(16)], "a: bigint, b: bigint"
    )
    keyed = layout.zorder_key(df, ["a", "b"], bits=4)
    rows = keyed.select("__zkey").collect()
    assert all(r["__zkey"] is not None for r in rows)
    # the all-NULL column contributes zero bits -> key ordering must
    # still follow the live column
    ordered = [
        r["a"]
        for r in keyed.orderBy("__zkey").select("a").collect()
    ]
    assert ordered == sorted(ordered)


def test_zorder_key_wide_range_no_overflow(spark):
    big = 3 * 10**15
    df = spark.createDataFrame(
        [(0, 0), (big, big), (big // 2, big // 3)], "a: bigint, b: bigint"
    )
    keyed = layout.zorder_key(df, ["a", "b"], bits=12)
    rows = {r["a"]: r["__zkey"] for r in keyed.collect()}
    top = (1 << 12) - 1
    # max row normalizes to top in both dims -> fully interleaved key
    expect_max = sum(1 << (b * 2) for b in range(12)) + sum(
        1 << (b * 2 + 1) for b in range(12)
    )
    assert rows[0] == 0
    assert rows[big] == expect_max
    assert 0 < rows[big // 2] < expect_max


def test_cohort_retention_pre_epoch_weeks_floor(spark):
    # one user signs up 3 days BEFORE the epoch and is active the same
    # week; truncate-toward-zero would fold those days into week 0
    # alongside post-epoch days
    ev = spark.createDataFrame(
        [
            (1, "signup", datetime.datetime(2023, 12, 29)),
            (1, "click", datetime.datetime(2023, 12, 30)),
            (2, "signup", datetime.datetime(2024, 1, 2)),
        ],
        "user_id: bigint, event_type: string, ts: timestamp",
    )
    out = behavior.cohort_retention(ev, "signup", epoch="2024-01-01").collect()
    weeks = {r["cohort_week"] for r in out}
    # the pre-epoch signup must land in week -1, not week 0
    assert -1 in weeks and 0 in weeks
    w_minus1 = [r for r in out if r["cohort_week"] == -1]
    assert all(r["retention_micro"] == 1000000 for r in w_minus1)
