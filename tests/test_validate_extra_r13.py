"""seeded_noisy_counts: seeded geometric mechanism (r13; renamed + NULL-safe key r14)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ai_etl_pipeline_spark.operators import validate


@pytest.fixture(scope="module")
def groups(spark):
    rows = [(i, ["a", "b", "c", "d"][i % 4]) for i in range(4000)]
    return spark.createDataFrame(rows, "id long, g string")


def test_dp_counts_deterministic_and_noisy(groups):
    a = {r["g"]: r["noisy_count"] for r in
         validate.seeded_noisy_counts(groups, ["g"], epsilon=0.5, salt="s1").collect()}
    b = {r["g"]: r["noisy_count"] for r in
         validate.seeded_noisy_counts(groups, ["g"], epsilon=0.5, salt="s1").collect()}
    assert a == b  # derandomized: same salt -> identical release
    true = 1000
    # noise present but bounded for eps=0.5 (geometric diff; P(|n|>60) ~ 1e-13)
    assert any(v != true for v in a.values())
    assert all(abs(v - true) < 60 for v in a.values())
    # different salt -> a different (deterministic) release
    c = {r["g"]: r["noisy_count"] for r in
         validate.seeded_noisy_counts(groups, ["g"], epsilon=0.5, salt="s2").collect()}
    assert c != a


def test_dp_counts_epsilon_scales_noise(groups):
    import statistics

    def mean_abs_noise(eps):
        rows = validate.seeded_noisy_counts(
            groups, ["g"], epsilon=eps, salt="sweep"
        ).collect()
        return statistics.mean(abs(r["noisy_count"] - 1000) for r in rows)

    # smaller epsilon (more privacy) must not produce LESS noise
    assert mean_abs_noise(0.05) >= mean_abs_noise(2.0)
    with pytest.raises(ValueError, match="epsilon"):
        validate.seeded_noisy_counts(groups, ["g"], epsilon=0.0)
    with pytest.raises(ValueError, match="sensitivity"):
        validate.seeded_noisy_counts(groups, ["g"], sensitivity=0)


def test_null_groups_get_distinct_noise(spark):
    # pre-r14 concat_ws DROPPED NULL group values, so ('a', NULL) and
    # (NULL, 'a') rendered to the same key 'a' and shared identical
    # noise; the NULL-safe 'n' / 'v|value' rendering keys them apart
    rows = [(1, "a", None), (2, "a", None), (3, None, "a"), (4, None, "a")]
    df = spark.createDataFrame(rows, "id long, g1 string, g2 string")
    # distinct keys -> INDEPENDENT draws: they may still coincide for one
    # salt by chance (small-eps geometric support), but under the old
    # concat_ws rendering both groups hashed the SAME key, so their noise
    # was identical for EVERY salt — any differing salt refutes that
    diffs = []
    for salt in ["s1", "s2", "s3", "s4"]:
        out = validate.seeded_noisy_counts(df, ["g1", "g2"], epsilon=0.5, salt=salt)
        got = {(r["g1"], r["g2"]): r["noisy_count"] for r in out.collect()}
        assert set(got) == {("a", None), (None, "a")}
        diffs.append(got[("a", None)] != got[(None, "a")])
    assert any(diffs)
