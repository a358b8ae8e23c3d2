"""Property-based tests (hypothesis) for the embedding
sufficient-statistics family, each against plain numpy on the same
randomized data — randomized SHAPE is the point (ragged partition
counts, null injection, degenerate clouds), not example count."""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ai_etl_pipeline_spark.operators import embedstats

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_DIMS = st.integers(2, 6)
_NROWS = st.integers(3, 40)
_PARTS = st.integers(1, 7)
_SEED = st.integers(0, 2**31 - 1)


def _frame(spark, seed: int, n: int, dim: int, parts: int, null_every: int = 0):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, dim) * (1 + rng.rand(dim) * 3)
    rows = []
    for i in range(n):
        vec = None if (null_every and i % null_every == 0) else [
            float(v) for v in x[i]
        ]
        rows.append((i, vec))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    mask = (
        np.ones(n, dtype=bool)
        if not null_every
        else np.asarray([i % null_every != 0 for i in range(n)])
    )
    return df.repartition(parts), x[mask]


@settings(**_SETTINGS)
@given(seed=_SEED, n=_NROWS, dim=_DIMS, parts=_PARTS)
def test_gramian_property(spark, seed, n, dim, parts):
    df, x = _frame(spark, seed, n, dim, parts, null_every=5)
    rows = embedstats.gramian_matrix(df, "embedding", dim).collect()
    g = np.zeros((dim, dim))
    for r in rows:
        assert r["n_rows"] == len(x)
        g[r["i"], r["j"]] = r["value"]
        g[r["j"], r["i"]] = r["value"]
    np.testing.assert_allclose(g, x.T @ x, rtol=1e-8, atol=1e-8)


@settings(**_SETTINGS)
@given(seed=_SEED, n=st.integers(8, 40), dim=_DIMS, parts=_PARTS)
def test_mahalanobis_property(spark, seed, n, dim, parts):
    df, x = _frame(spark, seed, n, dim, parts)
    got = {
        r["vec_id"]: r["mahalanobis"]
        for r in embedstats.mahalanobis_scores(
            df, "embedding", dim, shrinkage=1e-9
        ).collect()
    }
    cov = np.cov(x.T, bias=True)
    tr = np.trace(cov)
    ridge = 1e-9 * (tr / dim if tr > 0 else 1.0)
    prec = np.linalg.inv(cov + ridge * np.eye(dim))
    c = x - x.mean(axis=0)
    want = np.sqrt(np.maximum(np.einsum("ij,jk,ik->i", c, prec, c), 0))
    for i in range(len(x)):
        np.testing.assert_allclose(got[i], want[i], rtol=1e-5, atol=1e-6)


@settings(**_SETTINGS)
@given(seed=_SEED, n=st.integers(10, 40), dim=_DIMS, parts=_PARTS)
def test_probe_weights_property(spark, seed, n, dim, parts):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, dim)
    labels = rng.randint(0, 3, size=n)
    # hypothesis may draw label sets missing a class; the probe's class
    # list comes from the DATA, so replay with the observed classes
    df = spark.createDataFrame(
        [(int(i), [float(v) for v in x[i]], int(labels[i])) for i in range(n)],
        "vec_id long, embedding array<double>, label long",
    ).repartition(parts)
    classes, w = embedstats.linear_probe_train(df, "embedding", "label", dim, l2=2.0)
    obs = sorted(set(int(v) for v in labels))
    assert classes == obs
    y = np.zeros((n, len(obs)))
    for i, c in enumerate(labels):
        y[i, obs.index(int(c))] = 1.0
    want = np.linalg.solve(x.T @ x + 2.0 * np.eye(dim), x.T @ y).T
    np.testing.assert_allclose(w, want, rtol=1e-6, atol=1e-8)
