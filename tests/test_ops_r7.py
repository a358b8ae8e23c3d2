"""Round-7 wave-2 operators: quantile binning, k-fold assignment,
source interleave, quality-aware cluster winner, ORC round-trip."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from ai_etl_pipeline_spark.operators import clean, dedup, sampling
from ai_etl_pipeline_spark.sources.readers import read_orc
from ai_etl_pipeline_spark.sources.writers import write_orc


def test_quantile_bins_equal_frequency(spark):
    df = spark.createDataFrame([(i, float(i)) for i in range(1, 101)], "k long, v double")
    out = clean.quantile_bins(df, ["v"], n_bins=4)
    counts = (
        out.groupBy("v__bin").count().orderBy("v__bin").collect()
    )
    assert [r["v__bin"] for r in counts] == [0, 1, 2, 3]
    # equal-frequency: 100 rows over 4 bins, cuts at 25.75/50.5/75.25
    assert [r["count"] for r in counts] == [25, 25, 25, 25]
    nulls = spark.createDataFrame([(1, None), (2, 5.0)], "k long, v double")
    rows = {r["k"]: r["v__bin"] for r in clean.quantile_bins(nulls, ["v"], 2).collect()}
    assert rows[1] is None
    with pytest.raises(ValueError):
        clean.quantile_bins(df, [], 4)
    with pytest.raises(ValueError):
        clean.quantile_bins(df, ["v"], 1)


def test_quantile_bins_approx_close_to_exact(spark):
    df = spark.createDataFrame([(i, float(i)) for i in range(1, 101)], "k long, v double")
    exact = {r["k"]: r["v__bin"] for r in clean.quantile_bins(df, ["v"], 4).collect()}
    approx = {
        r["k"]: r["v__bin"]
        for r in clean.quantile_bins(df, ["v"], 4, approx=True).collect()
    }
    # GK at accuracy >> n: bins agree except possibly at cut boundaries
    diff = [k for k in exact if exact[k] != approx[k]]
    assert len(diff) <= 4


def test_kfold_group_consistent(spark, documents):
    out = sampling.kfold_assign(documents, "source", k=5)
    per_group = out.groupBy("source").agg(
        F.count_distinct("fold").alias("nf")
    ).collect()
    assert all(r["nf"] == 1 for r in per_group)
    folds = {r["fold"] for r in out.select("fold").distinct().collect()}
    assert folds <= set(range(5)) and len(folds) >= 2
    with pytest.raises(ValueError):
        sampling.kfold_assign(documents, "source", k=1)


def test_interleave_sources_round_robin(spark):
    rows = [(i, "a") for i in range(4)] + [(10 + i, "b") for i in range(2)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    out = {
        r["doc_id"]: r["train_order"]
        for r in sampling.interleave_sources(df, "src", "doc_id").collect()
    }
    # a: rank 0..3 -> positions 0,2,4,6 ; b: rank 0..1 -> 1,3
    assert [out[i] for i in range(4)] == [0, 2, 4, 6]
    assert [out[10], out[11]] == [1, 3]
    assert len(set(out.values())) == 6  # total order, no collisions


def test_keep_best_per_cluster_ties_and_singletons(spark):
    clustered = spark.createDataFrame(
        [(1, 1, 10.0), (2, 1, 30.0), (3, 1, 30.0), (4, 4, 5.0)],
        "doc_id long, cluster_id long, score double",
    )
    out = {r["doc_id"]: r for r in dedup.keep_best_per_cluster(clustered, "score").collect()}
    # tie on score 30 -> min id (2) wins
    assert out[2]["keep"] is True and out[2]["cluster_rank"] == 1
    assert out[3]["keep"] is False and out[3]["cluster_rank"] == 2
    assert out[1]["keep"] is False and out[1]["cluster_rank"] == 3
    assert out[4]["keep"] is True  # singleton


def test_orc_roundtrip(spark, documents):
    d = tempfile.mkdtemp(prefix="orc_rt_")
    try:
        write_orc(documents.select("doc_id", "text", "lang"), d)
        back = read_orc(spark, d, columns=["doc_id", "text", "lang"])
        a = documents.select(
            F.count("*"), F.sum(F.length("text")), F.min("doc_id")
        ).first()
        b = back.select(
            F.count("*"), F.sum(F.length("text")), F.min("doc_id")
        ).first()
        assert tuple(a) == tuple(b)
        # predicate pushdown reaches the ORC scan
        plan = back.where(F.col("doc_id") < 10)._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,10)]" in plan
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_pagerank_integer_exact_tiny_graph(spark):
    from ai_etl_pipeline_spark.operators import graph

    # path a-b-c (symmetric): b is the center and must rank highest
    edges = spark.createDataFrame([("a", "b"), ("b", "c")], "src string, dst string")
    out = {r["node"]: r for r in graph.pagerank(edges, iterations=8).collect()}

    # replicate the integer iteration in python
    adj = {"a": ["b"], "b": ["a", "c"], "c": ["b"]}
    rank = {n: 1_000_000 for n in adj}
    for _ in range(8):
        contrib = {n: rank[n] // len(adj[n]) for n in adj}
        incoming = {n: sum(contrib[m] for m in adj if n in adj[m]) for n in adj}
        rank = {n: (15 * 1_000_000 + 85 * incoming[n]) // 100 for n in adj}
    for n in adj:
        assert out[n]["rank"] == rank[n], (n, out[n]["rank"], rank[n])
    assert out["b"]["rank"] > out["a"]["rank"] == out["c"]["rank"]
    assert out["b"]["degree"] == 2

    with pytest.raises(ValueError):
        graph.pagerank(edges, iterations=0)
    with pytest.raises(ValueError):
        graph.pagerank(edges, damping_pct=0)


def test_mad_outliers_flags_and_nulls(spark):
    from ai_etl_pipeline_spark.operators import clean

    rows = [(i, float(i)) for i in range(1, 12)] + [(99, 1000.0), (100, None)]
    df = spark.createDataFrame(rows, "k long, v double")
    out = {r["k"]: r for r in clean.mad_outliers(df, ["v"], k=3.5).collect()}
    # median of 1..11,1000 = 6.5; MAD = median|x-6.5| = 3.5 -> cutoff 12.25
    assert out[99]["v__is_outlier"] is True
    assert all(out[i]["v__is_outlier"] is False for i in range(1, 12))
    assert out[100]["v__is_outlier"] is False and out[100]["v__mad_resid"] is None
    with pytest.raises(ValueError):
        clean.mad_outliers(df, [], 3.5)
    with pytest.raises(ValueError):
        clean.mad_outliers(df, ["v"], 0)


def test_language_id_confidence_margin(spark):
    from ai_etl_pipeline_spark.operators import textstats

    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house with food for everyone"),
            (2, "der la the und von"),  # mixed: de=2 en=1 es=1
            (3, "zzz qqq xxx"),  # no markers
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in textstats.language_id_confidence(df, "text").collect()}
    assert out[1]["lang_pred"] == "en" and out[1]["lang_margin"] >= 3
    assert out[2]["lang_pred"] == "de" and out[2]["best_hits"] == 2
    assert out[2]["second_hits"] == 1 and out[2]["lang_margin"] == 1
    assert out[3]["lang_pred"] == "und" and out[3]["best_hits"] == 0
    # agrees with language_id on the argmax (tie rule included)
    lid = {r["doc_id"]: r["lang_pred"] for r in textstats.language_id(df, "text").collect()}
    assert all(lid[k] == out[k]["lang_pred"] for k in lid)


def test_truncate_embeddings_unit_norm_and_short_vectors(spark):
    from ai_etl_pipeline_spark.operators import similarity

    df = spark.createDataFrame(
        [(1, [3.0, 4.0, 100.0, 100.0]), (2, [0.0, 0.0]), (3, [5.0])],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r["trunc_vec"] for r in
           similarity.truncate_embeddings(df, "embedding", dim=2).collect()}
    assert out[1] == pytest.approx([0.6, 0.8])  # 3-4-5 triangle
    assert out[2] == [0.0, 0.0]  # zero vector: no divide
    assert out[3] == [1.0]  # shorter than dim passes through whole
    raw = {r["vec_id"]: r["trunc_vec"] for r in
           similarity.truncate_embeddings(df, "embedding", dim=2, renormalize=False).collect()}
    assert raw[1] == [3.0, 4.0]
    with pytest.raises(ValueError):
        similarity.truncate_embeddings(df, "embedding", dim=0)


def test_hash_ring_negatives_properties(spark):
    rows = [(i, "a" if i < 8 else "b") for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = sampling.hash_ring_negatives(df, "doc_id", k=3, strata_col="lang").collect()
    by_anchor = {}
    for r in out:
        assert r["anchor"] != r["negative"]
        by_anchor.setdefault(r["anchor"], []).append(r)
    # every doc anchors exactly k distinct negatives (strata sizes > k)
    assert set(by_anchor) == set(range(12))
    for a, rs in by_anchor.items():
        assert len(rs) == 3
        assert len({r["negative"] for r in rs}) == 3
        # negatives stay within the anchor's stratum
        lang = "a" if a < 8 else "b"
        assert all(r["lang"] == lang for r in rs)
    # deterministic across invocations
    again = sampling.hash_ring_negatives(df, "doc_id", k=3, strata_col="lang").collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # tiny stratum (n <= k): self-pairs dropped, duplicates collapsed
    tiny = spark.createDataFrame([(1, "x"), (2, "x")], "doc_id long, lang string")
    t = sampling.hash_ring_negatives(tiny, "doc_id", k=3, strata_col="lang").collect()
    assert sorted((r["anchor"], r["negative"]) for r in t) == [(1, 2), (2, 1)]
    with pytest.raises(ValueError):
        sampling.hash_ring_negatives(df, "doc_id", k=0)


def test_resample_locf_fills_gaps(spark):
    from ai_etl_pipeline_spark.operators import relational

    rows = [
        (1, "2024-01-01 00:10:00", 10.0),
        (1, "2024-01-01 02:30:00", 20.0),
        (2, "2024-01-01 05:00:00", 7.0),
    ]
    df = spark.createDataFrame(rows, "k long, ts string, v double").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = relational.resample_locf(df, "k", "ts", ["v"], step="1 hour")
    got = {(r["k"], str(r["ts"])): r["v"] for r in out.collect()}
    # user 1: grid 00:00,01:00,02:00 (obs at 00:10 not yet seen at 00:00)
    assert got[(1, "2024-01-01 00:00:00")] is None  # before first obs
    assert got[(1, "2024-01-01 01:00:00")] == 10.0  # carried forward
    assert got[(1, "2024-01-01 02:00:00")] == 10.0  # 02:30 obs is later
    # user 2: single on-grid observation is its own fill
    assert got[(2, "2024-01-01 05:00:00")] == 7.0
    assert len([k for k in got if k[0] == 1]) == 3
    with pytest.raises(ValueError):
        relational.resample_locf(df, "k", "ts", [], "1 hour")


def test_histogram_equi_width(spark):
    from ai_etl_pipeline_spark.operators import distinct as d

    df = spark.createDataFrame(
        [(float(i),) for i in range(0, 101)] + [(None,)], "v double"
    )
    out = {r["bin"]: r for r in d.histogram(df, "v", bins=4).collect()}
    # width 25: bins [0,25) [25,50) [50,75) [75,100]; max lands in last
    assert [out[b]["n_rows"] for b in range(4)] == [25, 25, 25, 26]
    assert out[0]["bin_lo"] == 0.0 and out[3]["bin_hi"] == 100.0
    # constant column: one bin, everything in it
    const = spark.createDataFrame([(5.0,)] * 7, "v double")
    c = d.histogram(const, "v", bins=4).collect()
    assert len(c) == 1 and c[0]["n_rows"] == 7 and c[0]["bin"] == 0
    with pytest.raises(ValueError):
        d.histogram(df, "v", bins=0)


def test_mad_outliers_approx_agrees(spark):
    from ai_etl_pipeline_spark.operators import clean

    rows = [(i, float(i)) for i in range(1, 200)] + [(999, 10000.0)]
    df = spark.createDataFrame(rows, "k long, v double")
    exact = {r["k"]: r["v__is_outlier"] for r in clean.mad_outliers(df, ["v"]).collect()}
    approx = {
        r["k"]: r["v__is_outlier"]
        for r in clean.mad_outliers(df, ["v"], approx=True).collect()
    }
    # sketch exact at this n up to element-vs-interpolated medians:
    # the extreme outlier flags identically, boundary rows may differ
    assert approx[999] is True and exact[999] is True
    diff = [k for k in exact if exact[k] != approx[k]]
    assert len(diff) <= 10


def test_table_diff_statuses(spark):
    from ai_etl_pipeline_spark.operators import cdc

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", None), (4, "d", 40)],
        "k long, s string, v long",
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (3, "c", None), (5, "e", 50)],
        "k long, s string, v long",
    )
    out = {r["k"]: r["diff_status"] for r in cdc.table_diff(old, new, ["k"]).collect()}
    assert out == {1: "unchanged", 2: "changed", 3: "unchanged", 4: "removed", 5: "added"}
    # NULL is not the same as the string '<NULL>'-free concat skip:
    # a row whose value flips NULL -> 'x' must register as changed
    new2 = spark.createDataFrame([(3, "c", 99)], "k long, s string, v long")
    out2 = {r["k"]: r["diff_status"] for r in cdc.table_diff(old, new2, ["k"]).collect()}
    assert out2[3] == "changed"
    with pytest.raises(ValueError):
        cdc.table_diff(old, new, [])
    with pytest.raises(ValueError):
        cdc.table_diff(old.select("k"), new.select("k"), ["k"])


def test_template_fingerprint_collapses_digits(spark):
    out = dedup.template_fingerprint(
        spark.createDataFrame(
            [
                (1, "Order 1234 shipped  2024-01-05"),
                (2, "order 99 SHIPPED 2025-03-07".replace("SHIPPED", "shipped")),
                (3, "totally different text"),
            ],
            "doc_id long, text string",
        ),
        "text",
    ).collect()
    fps = {r["doc_id"]: r["template_fp"] for r in out}
    assert fps[1] == fps[2] and fps[1] != fps[3]


def test_canonicalize_url_rules(spark):
    from ai_etl_pipeline_spark.operators import textstats

    cases = [
        (1, "HTTP://Example.COM:80/A/B?utm_source=x&q=1&ref=r#frag", "http://example.com/A/B?q=1"),
        (2, "https://Host.net:443/", "https://host.net/"),
        (3, "https://host.net:8443/x", "https://host.net:8443/x"),  # non-default port kept
        (4, "http://a.b/p?utm_a=1&utm_b=2", "http://a.b/p"),  # all params stripped -> no '?'
        (5, "https://a.b/p?gclid=z&keep=1&fbclid=w", "https://a.b/p?keep=1"),
    ]
    df = spark.createDataFrame([(i, u) for i, u, _ in cases], "k long, url string")
    out = {r["k"]: r["canon_url"] for r in textstats.canonicalize_url(df, "url").collect()}
    for i, _, want in cases:
        assert out[i] == want, (i, out[i], want)


def test_triangle_count_known_graphs(spark):
    from ai_etl_pipeline_spark.operators import graph

    # K4 has 4 triangles; edges given unordered/duplicated/self-looped
    k4 = [(a, b) for a in range(4) for b in range(4) if a != b] + [(2, 2)]
    df = spark.createDataFrame(k4, "src long, dst long")
    r = graph.triangle_count(df).first()
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (4, 6, 4)
    # a path has none
    path = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src long, dst long")
    assert graph.triangle_count(path).first()["n_triangles"] == 0


def test_join_strategy_report_branches(spark):
    from ai_etl_pipeline_spark.operators import relational

    big = spark.range(0, 2000).select((F.col("id") % 50).alias("k"))
    small = spark.range(0, 10).select(F.col("id").alias("k"))
    r = relational.join_strategy_report(big, small, "k", broadcast_rows=100).first()
    assert r["recommendation"] == "broadcast_right"
    assert r["left_rows"] == 2000 and r["right_keys"] == 10
    # skew: one key owns half the big side, neither side broadcastable
    skewed = spark.range(0, 1000).select(
        F.when(F.col("id") < 500, F.lit(7)).otherwise(F.col("id")).alias("k")
    )
    other = spark.range(0, 900).select(F.col("id").alias("k"))
    r2 = relational.join_strategy_report(skewed, other, "k", broadcast_rows=100).first()
    assert r2["recommendation"] == "salt_or_aqe_skew"
    assert r2["max_key_share"] == 0.5
    even = spark.range(0, 1000).select(F.col("id").alias("k"))
    r3 = relational.join_strategy_report(even, other, "k", broadcast_rows=100).first()
    assert r3["recommendation"] == "shuffle_hash_or_sort_merge"
