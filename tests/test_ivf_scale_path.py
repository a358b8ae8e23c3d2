"""IVF √n sizing rule + BLAS cell-assignment path (r12 verdict #3:
a fixed cell count makes the probed fraction constant ~25% of the
corpus; cells ~ √n with fixed nprobe makes it fall per decade)."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from ai_etl_pipeline_spark.operators import similarity


def test_ivf_cells_for_sqrt_rule():
    assert similarity.ivf_cells_for(0) == 8
    assert similarity.ivf_cells_for(500) == 16  # sqrt=22 -> pow2 floor 16
    assert similarity.ivf_cells_for(20_000) == 128
    assert similarity.ivf_cells_for(200_000) == 256
    assert similarity.ivf_cells_for(2_000_000) == 1024
    assert similarity.ivf_cells_for(2_000_000, min_cells=2048) == 2048
    assert similarity.ivf_cells_for(10**14, max_cells=1 << 18) == 1 << 18
    # probed FRACTION falls as the corpus decades (nprobe fixed)
    fr = [2 / similarity.ivf_cells_for(n) for n in (10**4, 10**6, 10**8)]
    assert fr[0] > fr[1] > fr[2]


def test_kmeans_local_np_matches_sequential_trainer():
    rng = np.random.RandomState(3)
    rows = [(i, rng.randn(8).round(3).tolist()) for i in range(300)]
    seq = similarity.kmeans_centroids_local(rows, k=8, iterations=3)
    vec = similarity.kmeans_centroids_local_np(rows, k=8, iterations=3)
    assert [c for c, _ in seq] == [c for c, _ in vec]
    for (_, a), (_, b) in zip(seq, vec):
        # both round distances AND means to 6dp; BLAS reordering can
        # move a mean by 1 ulp-of-6dp at most
        np.testing.assert_allclose(a, b, atol=2e-6)


def test_ivf_assign_cells_matches_numpy(spark):
    rng = np.random.RandomState(11)
    vecs = rng.randn(200, 16)
    cents = [(c, rng.randn(16).tolist()) for c in range(64)]
    df = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(len(vecs))],
        "vec_id long, embedding array<double>",
    ).repartition(7)

    out = {
        r["vec_id"]: r["cell"]
        for r in similarity.ivf_assign_cells(df, "embedding", cents).collect()
    }
    cm = np.asarray([v for _, v in cents])
    cos = (vecs @ cm.T) / np.linalg.norm(vecs, axis=1)[:, None] / np.linalg.norm(
        cm, axis=1
    )[None, :]
    want = np.argmax(np.round(cos, 6), axis=1)
    assert out == {i: int(want[i]) for i in range(len(vecs))}

    # nprobe > 1: per row the nprobe best cells, best first
    pr = similarity.ivf_assign_cells(df, "embedding", cents, nprobe=3).collect()
    by_row = {}
    for r in pr:
        by_row.setdefault(r["vec_id"], []).append((r["probe_rank"], r["cell"]))
    order = np.argsort(-np.round(cos, 6), axis=1, kind="stable")[:, :3]
    for i in range(len(vecs)):
        assert [c for _, c in sorted(by_row[i])] == [int(c) for c in order[i]]

    # ties break to the SMALLEST centroid id (duplicate centroid vecs)
    dup = [(5, [1.0, 0.0]), (9, [1.0, 0.0]), (2, [0.0, 1.0])]
    d2 = spark.createDataFrame(
        [(1, [2.0, 0.1])], "vec_id long, embedding array<double>"
    )
    row = similarity.ivf_assign_cells(d2, "embedding", dup).collect()[0]
    assert row["cell"] == 5

    with pytest.raises(ValueError, match="nprobe"):
        similarity.ivf_assign_cells(df, "embedding", cents, nprobe=0)


def test_ivf_knn_blas_path_equals_crossjoin_path(spark):
    """ivf_knn flips to the Arrow/BLAS assignment at >= 64 pretrained
    centroids; the result must be IDENTICAL to the broadcast-crossJoin
    plan (same 6dp rounding, same smallest-id tie-break)."""
    rng = np.random.RandomState(7)
    vecs = rng.randn(400, 12)
    emb = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(len(vecs))],
        "vec_id long, embedding array<double>",
    )
    queries = emb.where(F.col("vec_id") < 6)
    sample = [(i, vecs[i].tolist()) for i in range(len(vecs))]
    cents = similarity.kmeans_centroids_local_np(sample, k=64, iterations=2)

    blas = similarity.ivf_knn(
        emb, queries, k=4, nprobe=3, centroids=cents
    ).collect()
    # force the crossJoin path by splitting the same centroid list into
    # a below-threshold call twice is impossible — replay it manually:
    # assignment via the SQL plan shape (crossJoin argmax on the same
    # centroid frame), then the identical probe/score/topk pipeline.
    small = similarity.ivf_knn(
        emb, queries, k=4, nprobe=3,
        centroids=cents[:63],  # below threshold -> crossJoin path
    ).collect()
    # sanity: the 63-cell run proves the crossJoin path still works
    assert {r["query_id"] for r in small} == {0, 1, 2, 3, 4, 5}

    # exact equality gate: replay the 64-cell assignment numpy-side and
    # verify each query's result set against brute-force within the
    # probed cells
    cm = np.asarray([v for _, v in sorted(cents)])
    ids = np.asarray([c for c, _ in sorted(cents)])
    cos = (vecs @ cm.T) / np.linalg.norm(vecs, axis=1)[:, None] / np.linalg.norm(
        cm, axis=1
    )[None, :]
    cell_of = ids[np.argmax(np.round(cos, 6), axis=1)]
    got = {}
    for r in blas:
        got.setdefault(r["query_id"], []).append(
            (r["rn"], r["neighbor_id"], r["cosine"])
        )
    for qid in range(6):
        probe_cells = ids[
            np.argsort(-np.round(cos[qid], 6), kind="stable")[:3]
        ]
        cand = [
            j
            for j in range(len(vecs))
            if cell_of[j] in set(probe_cells) and j != qid
        ]
        sims = (vecs[cand] @ vecs[qid]) / (
            np.linalg.norm(vecs[cand], axis=1) * np.linalg.norm(vecs[qid])
        )
        want = sorted(
            zip(np.round(sims, 6), [-j for j in cand]), reverse=True
        )[:4]
        want = [(-j, s) for s, j in want]
        assert [(nid, c) for _, nid, c in sorted(got[qid])] == [
            (nid, pytest.approx(s, abs=1e-9)) for nid, s in want
        ]
