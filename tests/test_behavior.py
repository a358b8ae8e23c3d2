"""Behavioral analytics: sequential funnel ordering/span semantics and
cohort-retention week bucketing."""

import datetime as dt

import pytest

from ai_etl_pipeline_spark.operators import behavior


def _ev(spark, rows):
    return spark.createDataFrame(rows, ["user_id", "event_type", "ts"])


T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _at(**kw):
    return T0 + dt.timedelta(**kw)


def test_funnel_counts_ordered_paths_only(spark):
    rows = [
        # u1 converts in order
        (1, "view", _at(hours=1)),
        (1, "click", _at(hours=2)),
        (1, "purchase", _at(hours=3)),
        # u2 clicks BEFORE viewing -> stops at step 1
        (2, "click", _at(hours=1)),
        (2, "view", _at(hours=2)),
        # u3 views then clicks, never purchases
        (3, "view", _at(hours=1)),
        (3, "click", _at(hours=5)),
        # u4 never views (purchase alone doesn't enter the funnel)
        (4, "purchase", _at(hours=1)),
    ]
    out = {
        r["step"]: r
        for r in behavior.funnel(
            _ev(spark, rows), ["view", "click", "purchase"]
        ).collect()
    }
    assert out[1]["n_users"] == 3
    assert out[2]["n_users"] == 2
    assert out[3]["n_users"] == 1
    assert out[1]["conversion_micro"] == 1_000_000
    assert out[2]["conversion_micro"] == 2_000_000 // 3
    assert out[3]["conversion_micro"] == 1_000_000 // 3
    assert out[3]["step_conversion_micro"] == 500_000


def test_funnel_strictly_after_and_first_touch(spark):
    rows = [
        # simultaneous view+click: click is NOT strictly after -> no step 2
        (1, "view", _at(hours=1)),
        (1, "click", _at(hours=1)),
        # u2: second view is later, but funnel anchors on the FIRST view,
        # so the click between the views still converts
        (2, "view", _at(hours=1)),
        (2, "click", _at(hours=2)),
        (2, "view", _at(hours=3)),
    ]
    out = {
        r["step"]: r["n_users"]
        for r in behavior.funnel(_ev(spark, rows), ["view", "click"]).collect()
    }
    assert out == {1: 2, 2: 1}


def test_funnel_max_span_cuts_late_conversions(spark):
    rows = [
        (1, "view", _at(hours=0)),
        (1, "click", _at(hours=1)),          # inside the 2h span
        (2, "view", _at(hours=0)),
        (2, "click", _at(hours=3)),          # outside
    ]
    out = {
        r["step"]: r["n_users"]
        for r in behavior.funnel(
            _ev(spark, rows), ["view", "click"], max_span_seconds=7200
        ).collect()
    }
    assert out == {1: 2, 2: 1}


def test_funnel_rejects_single_step(spark):
    with pytest.raises(ValueError):
        behavior.funnel(_ev(spark, [(1, "view", T0)]), ["view"])


def test_cohort_retention_week_buckets(spark):
    rows = [
        # u1 signs up week 0, active weeks 0 and 1
        (1, "signup", _at(days=1)),
        (1, "click", _at(days=8)),
        # u2 signs up week 0, active week 0 only
        (2, "signup", _at(days=2)),
        # u3 signs up week 1, active weeks 1 and 3
        (3, "signup", _at(days=7)),
        (3, "view", _at(days=22)),
        # u4 never signs up -> not cohorted, activity ignored
        (4, "click", _at(days=1)),
    ]
    out = {
        (r["cohort_week"], r["week_offset"]): (
            r["n_cohort"],
            r["n_active"],
            r["retention_micro"],
        )
        for r in behavior.cohort_retention(
            _ev(spark, rows), "signup", epoch="2024-01-01"
        ).collect()
    }
    assert out[(0, 0)] == (2, 2, 1_000_000)
    assert out[(0, 1)] == (2, 1, 500_000)
    assert out[(1, 0)] == (1, 1, 1_000_000)
    assert out[(1, 2)] == (1, 1, 1_000_000)
    assert (0, 2) not in out and (1, 1) not in out


def test_cohort_retention_max_weeks_bound(spark):
    rows = [
        (1, "signup", _at(days=0)),
        (1, "click", _at(days=70)),  # week 10 -> outside max_weeks=4
    ]
    out = behavior.cohort_retention(
        _ev(spark, rows), "signup", epoch="2024-01-01", max_weeks=4
    ).collect()
    assert {(r["cohort_week"], r["week_offset"]) for r in out} == {(0, 0)}
