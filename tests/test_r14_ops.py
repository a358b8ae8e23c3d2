"""r14 operators: LSH oversized-bucket cap (the boilerplate-family n²
bound), IVFADC (ivfpq_index / ivfpq_knn), and the r13-ADVICE guards on
ivf_knn / ivf_assign_cells."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ai_etl_pipeline_spark.functions.portable import md5_i64_py
from ai_etl_pipeline_spark.operators import dedup, similarity


# ------------------------------------------------------------- LSH cap


@pytest.fixture(scope="module")
def skewed_corpus(spark):
    """60 near-identical template docs (one mega band bucket) + 40
    distinct docs — the boilerplate-family shape the cap exists for."""
    template = "please unsubscribe from this mailing list footer boilerplate"
    rows = [(i, template) for i in range(60)]
    rows += [
        (100 + i, f"unique document number {i} about topic {i * 7} with words {i * 13}")
        for i in range(40)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _cand_pairs(corpus, max_bucket):
    sigs = dedup.minhash_signatures(
        dedup.doc_shingles(corpus, "doc_id", "text", 3), "doc_id", "shingle", 16
    )
    return dedup.lsh_candidate_pairs(sigs, "doc_id", 16, 8, max_bucket)


def test_lsh_max_bucket_bounds_the_template_family(skewed_corpus):
    uncapped = {(r.id_a, r.id_b) for r in _cand_pairs(skewed_corpus, None).collect()}
    capped = {(r.id_a, r.id_b) for r in _cand_pairs(skewed_corpus, 8).collect()}
    # the 60-doc identical family alone is C(60,2) = 1770 uncapped pairs
    assert len(uncapped) >= 1770
    # capped candidates are a SUBSET (hash-split only removes pairs)
    assert capped <= uncapped
    # and the family's quadratic is actually bent: with 8 bands and
    # ceil(60/8)=8 sub-buckets the expected family pairs fall ~8x
    assert len(capped) < len(uncapped) / 3
    # distinct docs (tiny buckets) are untouched by the cap


def test_lsh_sub_bucket_assignment_replays_the_formula(skewed_corpus):
    # every pair the cap keeps must share md5(id) % ceil(n/cap) in some
    # band — check the family block structure against the driver-side
    # twin of the hash (the oracle replays the same arithmetic)
    fam = list(range(60))
    n = 60  # family bucket size in every band (identical docs)
    # cap=8: ceil(60/8)=8, already a power of two; cap=7: ceil(60/7)=9
    # rounds UP to 16 — exercises the pow2 branch of _n_splits_expr
    for cap in (8, 7):
        n_splits = 1 << max(0, math.ceil(math.log2(math.ceil(n / cap))))
        blocks: dict[int, set[int]] = {}
        for i in fam:
            blocks.setdefault(md5_i64_py(str(i)) % n_splits, set()).add(i)
        allowed = {
            (a, b)
            for blk in blocks.values()
            for a in blk
            for b in blk
            if a < b
        }
        capped = {
            (r.id_a, r.id_b)
            for r in _cand_pairs(skewed_corpus, cap).collect()
            if r.id_a < 60 and r.id_b < 60
        }
        assert capped == allowed, cap


def test_lsh_capped_incremental_equals_capped_full_rerun(spark, skewed_corpus):
    kw = dict(shingle_k=3, num_hashes=16, bands=8, threshold=0.5, max_bucket=8)
    full = dedup.minhash_lsh_near_duplicates(
        skewed_corpus, "doc_id", "text", **kw
    )
    want = {
        (r.id_a, r.id_b): r.jaccard
        for r in full.collect()
        if r.id_a % 5 == 0 or r.id_b % 5 == 0
    }
    corpus = skewed_corpus.where("doc_id % 5 != 0")
    delta = skewed_corpus.where("doc_id % 5 = 0")
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.minhash_lsh_incremental(
            corpus, delta, "doc_id", "text", **kw
        ).collect()
    }
    assert got == want
    assert got  # the family straddles the split, so the slice is nonempty


# -------------------------------------------------------------- IVFADC


@pytest.fixture(scope="module")
def vec_corpus(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    rows = [(i, rng.randn(8).round(3).tolist()) for i in range(48)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df, rows


def test_ivfpq_single_cell_equals_flat_pq(vec_corpus):
    df, rows = vec_corpus
    books = similarity.pq_train_local(rows, m=4, codebook_k=8, iterations=2)
    cents = [(0, [1.0] + [0.0] * 7)]  # one cell -> the probe covers the corpus
    qs = df.where(F.col("vec_id") < 3)
    flat = {
        (r.query_id, r.neighbor_id, r.cosine, r.rn)
        for r in similarity.pq_knn(df, qs, k=5, codebooks=books).collect()
    }
    composed = {
        (r.query_id, r.neighbor_id, r.cosine, r.rn)
        for r in similarity.ivfpq_knn(
            df, qs, k=5, nprobe=1, centroids=cents, codebooks=books
        ).collect()
    }
    assert composed == flat


def test_ivfpq_prunes_to_probed_cells(vec_corpus):
    df, rows = vec_corpus
    books = similarity.pq_train_local(rows, m=4, codebook_k=8, iterations=2)
    cents = similarity.kmeans_centroids_local(rows, k=4, iterations=2)
    qs = df.where(F.col("vec_id") < 3)
    idx = similarity.ivfpq_index(df, cents, books)
    out = similarity.ivfpq_knn(
        df, qs, k=5, nprobe=2, centroids=cents, codebooks=books, index=idx
    )
    got = out.collect()
    assert {r.query_id for r in got} == {0, 1, 2}
    # every returned neighbor must live in one of the query's 2 probed
    # cells — recompute cell membership from the index itself
    cells = {r.neighbor_id: r.cell for r in idx.collect()}
    probed = {
        r.query_id: set()
        for r in got
    }
    probe_rows = similarity.ivf_knn(
        df, qs, k=48, nprobe=2, centroids=cents
    ).collect()  # ivf with same quantizer: candidate set = probed cells
    ivf_cands = {}
    for r in probe_rows:
        ivf_cands.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in got:
        assert r.neighbor_id in ivf_cands[r.query_id], (r, cells[r.neighbor_id])


def test_ivfpq_rerank_returns_exact_cosines(vec_corpus):
    df, rows = vec_corpus
    books = similarity.pq_train_local(rows, m=4, codebook_k=8, iterations=2)
    cents = similarity.kmeans_centroids_local(rows, k=4, iterations=2)
    qs = df.where(F.col("vec_id") < 2)
    out = similarity.ivfpq_knn(
        df, qs, k=3, nprobe=4, centroids=cents, codebooks=books,
        rerank_candidates=10,
    ).collect()
    exact = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in similarity.brute_force_knn(df, qs, k=47).collect()
    }
    for r in out:
        # reranked cosines are the float-column cosines, not ADC ones
        assert exact[(r.query_id, r.neighbor_id)] == pytest.approx(
            r.cosine, abs=1e-9
        )


def test_ivfpq_requires_both_quantizers(vec_corpus):
    df, rows = vec_corpus
    books = similarity.pq_train_local(rows, m=4, codebook_k=8, iterations=2)
    with pytest.raises(ValueError, match="centroids"):
        similarity.ivfpq_knn(df, df.limit(1), codebooks=books)
    with pytest.raises(ValueError, match="rerank_candidates"):
        similarity.ivfpq_knn(
            df, df.limit(1), k=5, rerank_candidates=3,
            centroids=[(0, [1.0] + [0.0] * 7)], codebooks=books,
        )


# --------------------------------------------------- r13-ADVICE guards


def test_ivf_knn_index_without_centroids_raises(vec_corpus):
    df, rows = vec_corpus
    cents = similarity.kmeans_centroids_local(rows, k=4, iterations=2)
    idx = similarity.ivf_index(df, cents)
    with pytest.raises(ValueError, match="centroids"):
        similarity.ivf_knn(df, df.limit(2), index=idx)
    # with the build-time centroids supplied it works
    out = similarity.ivf_knn(
        df, df.where(F.col("vec_id") < 2), k=3, nprobe=2,
        centroids=cents, index=idx,
    )
    assert out.count() > 0


def test_ivf_assign_cells_nprobe_clamped_to_cell_count(vec_corpus):
    df, _ = vec_corpus
    cents = [(0, [1.0] + [0.0] * 7), (1, [0.0, 1.0] + [0.0] * 6),
             (2, [0.0] * 7 + [1.0])]
    out = similarity.ivf_assign_cells(
        df.limit(4), "embedding", cents, nprobe=9, out_col="cell"
    ).collect()
    # pre-r14 this raised a numpy shape ValueError; now it returns every
    # cell per row (the crossJoin path's graceful behavior)
    assert len(out) == 4 * 3
    by_row: dict[int, list[int]] = {}
    for r in out:
        by_row.setdefault(r.vec_id, []).append(r.probe_rank)
    assert all(sorted(v) == [1, 2, 3] for v in by_row.values())


def test_ivfpq_blas_path_all_cells_probed_equals_flat_pq(spark):
    """At >= 64 centroids ivfpq_index/ivfpq_knn flip to the Arrow/BLAS
    assignment; probing EVERY cell (nprobe = cells, via the clamp even
    when asked for more) makes the candidate set the full corpus, so
    the result must equal flat pq_knn bit-for-bit — one gate over the
    BLAS assignment, the cell-partitioned index, the probe clamp and
    the ADC composition."""
    import numpy as np

    rng = np.random.RandomState(11)
    rows = [(i, rng.randn(8).round(3).tolist()) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = similarity.pq_train_local(rows, m=4, codebook_k=8, iterations=2)
    cents = similarity.kmeans_centroids_local_np(rows, k=64, iterations=2)
    qs = df.where(F.col("vec_id") < 4)
    flat = {
        (r.query_id, r.neighbor_id, r.cosine, r.rn)
        for r in similarity.pq_knn(df, qs, k=5, codebooks=books).collect()
    }
    composed = {
        (r.query_id, r.neighbor_id, r.cosine, r.rn)
        for r in similarity.ivfpq_knn(
            df, qs, k=5, nprobe=100,  # > 64 cells -> clamped to all
            centroids=cents, codebooks=books,
        ).collect()
    }
    assert composed == flat


def test_lsh_capped_incremental_with_persisted_counts(spark, skewed_corpus):
    """Passing the index-time (band, sig, n) counts table must change
    NOTHING in the output — it only replaces the corpus-side rescan of
    the combined bucket-size aggregate (delta-untouched buckets may be
    dropped from the oversized list; they produce no delta-touching
    pairs either way)."""
    kw = dict(shingle_k=3, num_hashes=16, bands=8, threshold=0.5, max_bucket=8)
    corpus = skewed_corpus.where("doc_id % 5 != 0")
    delta = skewed_corpus.where("doc_id % 5 = 0")
    bands = dedup.minhash_band_relation(corpus, "doc_id", "text", 3, 16, 8)
    counts = dedup.minhash_band_counts(bands)
    without = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.minhash_lsh_incremental(
            corpus, delta, "doc_id", "text", **kw
        ).collect()
    }
    with_counts = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.minhash_lsh_incremental(
            corpus, delta, "doc_id", "text", **kw,
            corpus_bands=bands, corpus_band_counts=counts,
        ).collect()
    }
    assert with_counts == without
    assert with_counts  # the template family straddles the split
