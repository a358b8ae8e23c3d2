"""dp_noisy_counts: seeded geometric mechanism (r13)."""

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
         validate.dp_noisy_counts(groups, ["g"], epsilon=0.5, salt="s1").collect()}
    b = {r["g"]: r["noisy_count"] for r in
         validate.dp_noisy_counts(groups, ["g"], epsilon=0.5, salt="s1").collect()}
    assert a == b  # derandomized: same salt -> identical release
    true = 1000
    # noise present but bounded for eps=0.5 (geometric diff; P(|n|>60) ~ 1e-13)
    assert any(v != true for v in a.values())
    assert all(abs(v - true) < 60 for v in a.values())
    # different salt -> a different (deterministic) release
    c = {r["g"]: r["noisy_count"] for r in
         validate.dp_noisy_counts(groups, ["g"], epsilon=0.5, salt="s2").collect()}
    assert c != a


def test_dp_counts_epsilon_scales_noise(groups):
    import statistics

    def mean_abs_noise(eps):
        rows = validate.dp_noisy_counts(
            groups, ["g"], epsilon=eps, salt="sweep"
        ).collect()
        return statistics.mean(abs(r["noisy_count"] - 1000) for r in rows)

    # smaller epsilon (more privacy) must not produce LESS noise
    assert mean_abs_noise(0.05) >= mean_abs_noise(2.0)
    with pytest.raises(ValueError, match="epsilon"):
        validate.dp_noisy_counts(groups, ["g"], epsilon=0.0)
    with pytest.raises(ValueError, match="sensitivity"):
        validate.dp_noisy_counts(groups, ["g"], sensitivity=0)
