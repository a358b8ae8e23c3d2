"""Round-15 operators: scale-safe sign-LSH sizing (lsh_bits_for +
bounded_bucket_pairs), incremental IVFADC maintenance
(ivfpq_index_append), and the r14 ADVICE hardening items."""

import duckdb
import pytest
from pyspark.sql import functions as F

from ai_etl_pipeline_spark.operators import dedup, similarity, validate


@pytest.fixture(scope="module")
def vectors(spark):
    """Deterministic 64-dim corpus, 300 rows (the ann_scale_bench
    component formula so the distribution matches the receipts)."""
    comp = "(pmod(xxhash64('v', id, d), 2000001) - 1000000) / 1000000.0"
    return (
        spark.range(300)
        .select(
            F.col("id").alias("vec_id"),
            F.expr(
                f"transform(sequence(0, 63), d -> cast({comp} as double))"
            ).alias("embedding"),
        )
        .cache()
    )


# ------------------------------------------------------------ lsh_bits_for


def test_lsh_bits_for_basics():
    # smallest b with target * 2^b >= n
    assert similarity.lsh_bits_for(1) == 1
    assert similarity.lsh_bits_for(32) == 1
    assert similarity.lsh_bits_for(33) == 1
    assert similarity.lsh_bits_for(64) == 1
    assert similarity.lsh_bits_for(65) == 2
    assert similarity.lsh_bits_for(500) == 4
    assert similarity.lsh_bits_for(2_000) == 6
    assert similarity.lsh_bits_for(20_000) == 10
    assert similarity.lsh_bits_for(2_000_000) == 16
    # clamps
    assert similarity.lsh_bits_for(10**12) == 24
    assert similarity.lsh_bits_for(10**12, max_bits=8) == 8
    assert similarity.lsh_bits_for(5, min_bits=3) == 3
    # expected bucket size is bounded by construction
    for n in (100, 1_000, 77_777, 123_456_789):
        b = similarity.lsh_bits_for(n)
        assert n / (1 << b) <= 32 or b == 24


def test_lsh_bits_for_matches_oracle_rendering():
    """The DuckDB rendering CEIL(LOG2(n / 32.0)) must agree with the
    integer loop for every n an oracle could see — including exact
    powers of two, where a sloppy libm log2 would be off by one."""
    con = duckdb.connect()
    ns = (
        list(range(1, 2050))
        + [2**k for k in range(2, 40)]
        + [32 * 2**k for k in range(1, 30)]
        + [32 * 2**k + d for k in range(1, 20) for d in (-1, 1)]
        + [500, 2000, 20000, 200000, 2000000, 10**7, 10**9]
    )
    rows = con.sql(
        "SELECT n, GREATEST(1, LEAST(24, CAST(CEIL(LOG2(n / 32.0)) AS INTEGER)))"
        " FROM (SELECT unnest($ns) AS n)",
        params={"ns": ns},
    ).fetchall()
    for n, got in rows:
        assert got == similarity.lsh_bits_for(n), n


def test_sign_lsh_bucket_mask_identity(spark, vectors):
    """bucket(b bits) == bucket(24 bits) % 2^b — the identity the
    oracle's dynamic-bits rendering relies on."""
    rows = vectors.select(
        similarity.sign_lsh_bucket("embedding", 24).alias("full"),
        *[
            similarity.sign_lsh_bucket("embedding", b).alias(f"b{b}")
            for b in (1, 4, 6, 11)
        ],
    ).collect()
    for r in rows:
        for b in (1, 4, 6, 11):
            assert r[f"b{b}"] == r["full"] % (1 << b)


def test_lsh_knn_auto_equals_explicit_bits(spark, vectors):
    qs = vectors.where(F.col("vec_id") < 4)
    bits = similarity.lsh_bits_for(300)  # = 4
    assert bits == 4
    auto = similarity.lsh_knn(vectors, qs, k=3).collect()
    explicit = similarity.lsh_knn(vectors, qs, k=3, num_bits=bits).collect()
    assert sorted(map(tuple, auto)) == sorted(map(tuple, explicit))


def test_lsh_knn_auto_multiprobe(spark, vectors):
    qs = vectors.where(F.col("vec_id") < 4)
    # auto mp at 4 bits = min(4, max(2, 2)) = 2
    auto = similarity.lsh_knn(vectors, qs, k=3, multiprobe="auto").collect()
    explicit = similarity.lsh_knn(
        vectors, qs, k=3, num_bits=4, multiprobe=2
    ).collect()
    assert sorted(map(tuple, auto)) == sorted(map(tuple, explicit))
    # results form a superset-or-equal candidate pool vs single-probe:
    # every returned cosine per query is >= the single-probe one at
    # the same rank
    single = similarity.lsh_knn(vectors, qs, k=3, num_bits=4).collect()
    s = {(r.query_id, r.rn): r.cosine for r in single}
    m = {(r.query_id, r.rn): r.cosine for r in auto}
    for key, cos in s.items():
        assert m.get(key, -2.0) >= cos


# --------------------------------------------------- bounded_bucket_pairs


def _manual_pairs(rows, max_bucket):
    """Reference implementation of the split semantics."""
    from collections import defaultdict

    from ai_etl_pipeline_spark.functions.portable import md5_i64_py

    buckets = defaultdict(list)
    for vid, b in rows:
        buckets[b].append(vid)
    out = set()
    for b, members in buckets.items():
        n = len(members)
        if max_bucket is not None and n > max_bucket:
            raw = -(-n // max_bucket)
            splits = 1 << (raw - 1).bit_length()
            groups = defaultdict(list)
            for vid in members:
                groups[md5_i64_py(str(vid)) % splits].append(vid)
            pools = groups.values()
        else:
            pools = [members]
        for pool in pools:
            pool = sorted(pool)
            for i in range(len(pool)):
                for j in range(i + 1, len(pool)):
                    out.add((pool[i], pool[j]))
    return out


def test_bounded_bucket_pairs_uncapped_equals_plain_join(spark, vectors):
    b = vectors.select(
        "vec_id", similarity.sign_lsh_bucket("embedding", 3).alias("bucket")
    )
    capped = {
        (r.id_a, r.id_b)
        for r in similarity.bounded_bucket_pairs(b, "vec_id", max_bucket=10**6).collect()
    }
    rows = [(r.vec_id, r.bucket) for r in b.collect()]
    assert capped == _manual_pairs(rows, None)


def test_bounded_bucket_pairs_split_matches_reference(spark, vectors):
    b = vectors.select(
        "vec_id", similarity.sign_lsh_bucket("embedding", 2).alias("bucket")
    )
    rows = [(r.vec_id, r.bucket) for r in b.collect()]
    for cap in (8, 16, 40):
        got = {
            (r.id_a, r.id_b)
            for r in similarity.bounded_bucket_pairs(
                b, "vec_id", max_bucket=cap
            ).collect()
        }
        want = _manual_pairs(rows, cap)
        assert got == want
        # the cap actually bit: fewer pairs than uncapped
        assert len(got) < len(_manual_pairs(rows, None))


def test_bounded_bucket_pairs_bounds_the_quadratic(spark):
    """One mega-bucket (all-identical vectors): pairs fall from n^2/2
    to ~n*cap."""
    n, cap = 400, 16
    same = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 63), d -> cast(1.0 + d as double))"
        ).alias("embedding"),
    )
    b = same.select(
        "vec_id", similarity.sign_lsh_bucket("embedding", 4).alias("bucket")
    )
    n_pairs = similarity.bounded_bucket_pairs(b, "vec_id", max_bucket=cap).count()
    assert n_pairs < n * cap  # uncapped would be n*(n-1)/2 = 79800


# ------------------------------------------------------ ivfpq_index_append


def test_ivfpq_append_equals_full_rebuild(spark, vectors):
    rows = [
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in similarity.hash_ranked_sample(vectors, "vec_id", 128).collect()
    ]
    cents = similarity.kmeans_centroids_local(rows, k=8, iterations=2)
    books = similarity.pq_train_local(rows, m=4, codebook_k=16, iterations=2)
    base = vectors.where("vec_id % 10 != 7")
    delta = vectors.where("vec_id % 10 = 7")
    appended = similarity.ivfpq_index_append(
        similarity.ivfpq_index(base, cents, books), delta, cents, books
    )
    full = similarity.ivfpq_index(vectors, cents, books)
    key = lambda r: (r.neighbor_id, r.cell, tuple(r.pq_codes), r["__rr"])  # noqa: E731
    assert sorted(map(key, appended.collect())) == sorted(map(key, full.collect()))
    # and the queries over both indexes agree bit-for-bit
    qs = vectors.where(F.col("vec_id") < 4)
    via_append = similarity.ivfpq_knn(
        vectors, qs, k=3, nprobe=2, centroids=cents, codebooks=books,
        index=appended,
    ).collect()
    via_full = similarity.ivfpq_knn(
        vectors, qs, k=3, nprobe=2, centroids=cents, codebooks=books,
        index=full,
    ).collect()
    assert sorted(map(tuple, via_append)) == sorted(map(tuple, via_full))


def test_ivfpq_internal_index_is_unpersisted(spark, vectors):
    """r14 ADVICE: the single-use internal index must not leak a cached
    table for the session's lifetime."""
    import py4j

    sc = spark.sparkContext
    jsc = sc._jsc.sc()
    qs = vectors.where(F.col("vec_id") < 2)
    rows = [
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in similarity.hash_ranked_sample(vectors, "vec_id", 128).collect()
    ]
    cents = similarity.kmeans_centroids_local(rows, k=8, iterations=2)
    books = similarity.pq_train_local(rows, m=4, codebook_k=16, iterations=2)
    before = jsc.getPersistentRDDs().size()
    similarity.ivfpq_knn(
        vectors, qs, k=3, nprobe=2, centroids=cents, codebooks=books
    ).collect()
    after = jsc.getPersistentRDDs().size()
    assert after <= before, (before, after)
    del py4j


# ----------------------------------------------- hash_ranked_sample cutoff


def test_hash_ranked_sample_cutoff_equals_bare_topk(spark):
    """The corpus_rows pre-filter (r15: bounds the driver's
    TakeOrderedAndProject partials at O(n) instead of O(tasks × n))
    must return EXACTLY the bare top-k — the filter keeps a superset
    of the true top n by construction."""
    from ai_etl_pipeline_spark.operators import similarity

    df = spark.range(50_000).select(F.col("id").alias("vec_id"))
    for n in (16, 256, 1024):
        bare = [r.vec_id for r in
                similarity.hash_ranked_sample(df, "vec_id", n).collect()]
        cut = [r.vec_id for r in
               similarity.hash_ranked_sample(
                   df, "vec_id", n, corpus_rows=50_000
               ).collect()]
        assert cut == bare and len(cut) == n
    # corpus smaller than 8n: the filter must not engage / not truncate
    small = spark.range(100).select(F.col("id").alias("vec_id"))
    got = similarity.hash_ranked_sample(
        small, "vec_id", 64, corpus_rows=100
    ).count()
    assert got == 64


# --------------------------------------------------------- ADVICE hardening


def test_noisy_counts_delimiter_injection_fixed(spark):
    """('a|v','b') and ('a','v|b') used to render the same group key and
    draw IDENTICAL noise for every salt; the length-prefixed rendering
    makes them independent draws — some salt must tell them apart."""
    rows = [(1, "a|v", "b"), (2, "a", "v|b")]
    df = spark.createDataFrame(rows, "id long, g1 string, g2 string")
    diffs = []
    for salt in ["s1", "s2", "s3", "s4", "s5", "s6"]:
        out = validate.seeded_noisy_counts(df, ["g1", "g2"], epsilon=0.5, salt=salt)
        got = {(r["g1"], r["g2"]): r["noisy_count"] for r in out.collect()}
        assert set(got) == {("a|v", "b"), ("a", "v|b")}
        diffs.append(got[("a|v", "b")] != got[("a", "v|b")])
    assert any(diffs)


def test_incremental_counts_table_requires_n_column(spark, documents):
    corpus = documents.where("doc_id % 5 != 0")
    delta = documents.where("doc_id % 5 = 0")
    bands = dedup.minhash_band_relation(corpus, "doc_id", "text", 3, 16, 8)
    bad = dedup.minhash_band_counts(bands).withColumnRenamed("n", "cnt")
    with pytest.raises(ValueError, match="column named 'n'"):
        dedup.minhash_lsh_incremental(
            corpus, delta, "doc_id", "text",
            max_bucket=8, corpus_bands=bands, corpus_band_counts=bad,
        )
