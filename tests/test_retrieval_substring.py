"""Round-6 wave-4 operators: BM25 keyword retrieval, RRF hybrid
fusion, substring-level duplicate-span dedup (Lee et al. 2022 shape),
bigram LM perplexity (CCNet shape), JSONL source/sink round-trip."""

import math

import pytest
from pyspark.sql import functions as F

from ai_etl_pipeline_spark.operators import dedup, similarity, textstats


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------

def _bm25_expected(docs, terms, k1=1.2, b=0.75):
    """Straight-line reference implementation."""
    toks = {i: t.lower().split() for i, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for i, _ in docs:
        dl = len(toks[i])
        s = 0.0
        for term in terms:
            tf = toks[i].count(term)
            dfreq = sum(1 for v in toks.values() if term in v)
            idf = math.log(1.0 + (n - dfreq + 0.5) / (dfreq + 0.5))
            s += idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        out[i] = round(s, 6)
    return out


def test_bm25_matches_reference_formula(spark):
    rows = [
        (1, "spark runs fast spark scales"),
        (2, "pandas is eager"),
        (3, "spark joins and windows"),
        (4, "nothing relevant here at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["bm25"]
        for r in textstats.bm25_scores(df, "doc_id", "text", ["spark", "windows"]).collect()
    }
    want = _bm25_expected(rows, ["spark", "windows"])
    for i in want:
        assert got[i] == pytest.approx(want[i], abs=2e-6), i
    assert got[4] == 0.0  # no query term -> exactly zero


def test_bm25_topk_rank_and_ties(spark):
    rows = [(i, "common filler words") for i in range(5)] + [
        (10, "target target target"),
        (11, "target here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    top = textstats.bm25_topk(df, "doc_id", "text", ["target"], k=5).collect()
    assert [r["doc_id"] for r in top][:2] == [10, 11]  # tf dominates
    assert [r["rank"] for r in top] == list(range(1, len(top) + 1))
    assert all(r["bm25"] > 0 for r in top)  # zero-score docs filtered


def test_bm25_rejects_bad_query(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        textstats.bm25_scores(df, "doc_id", "text", [])
    with pytest.raises(ValueError):
        textstats.bm25_scores(df, "doc_id", "text", ["x", "X"])  # dup after lower


# ---------------------------------------------------------------------------
# RRF fusion
# ---------------------------------------------------------------------------

def test_rrf_fuse_two_lists(spark):
    kw = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id long, rank int")
    ann = spark.createDataFrame([(2, 1), (4, 2)], "doc_id long, rank int")
    got = {
        r["doc_id"]: (r["rrf_score"], r["n_lists"], r["best_rank"])
        for r in similarity.rrf_fuse([kw, ann], "doc_id", rrf_k=60).collect()
    }
    assert got[2] == (round(1 / 62 + 1 / 61, 6), 2, 1)  # in both lists
    assert got[1] == (round(1 / 61, 6), 1, 1)
    assert got[4] == (round(1 / 62, 6), 1, 2)
    # doc 2 (two lists) outranks doc 1 (one list, rank 1)
    ordered = [
        r["doc_id"]
        for r in similarity.rrf_fuse([kw, ann], "doc_id", topk=2).collect()
    ]
    assert ordered[0] == 2


def test_rrf_fuse_rejects_empty(spark):
    with pytest.raises(ValueError):
        similarity.rrf_fuse([], "doc_id")


# ---------------------------------------------------------------------------
# substring duplicate spans
# ---------------------------------------------------------------------------

def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_duplicate_spans_exact_bounds(spark):
    shared = "one two three four five six seven eight"  # exactly 8 tokens
    docs = _mk_docs(
        spark,
        [
            (1, f"alpha beta {shared} gamma"),
            (2, f"{shared} delta epsilon"),
            (3, "totally unrelated text with enough tokens here ok"),
        ],
    )
    spans = {
        (r["doc_id"]): (r["span_start"], r["span_end"], r["span_tokens"])
        for r in dedup.duplicate_ngram_spans(docs, "doc_id", "text", n=8).collect()
    }
    # doc 1: shared run occupies token positions 3..10 (1-based)
    assert spans[1] == (3, 10, 8)
    # doc 2: positions 1..8
    assert spans[2] == (1, 8, 8)
    assert 3 not in spans


def test_duplicate_spans_merge_overlapping(spark):
    # 10 shared tokens -> three overlapping 8-gram hits -> ONE merged span
    shared = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"
    docs = _mk_docs(spark, [(1, shared), (2, f"pre {shared} post")])
    spans = dedup.duplicate_ngram_spans(docs, "doc_id", "text", n=8).collect()
    by_doc = {}
    for r in spans:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == 1 and len(by_doc[2]) == 1
    assert (by_doc[1][0]["span_start"], by_doc[1][0]["span_end"]) == (1, 10)
    assert (by_doc[2][0]["span_start"], by_doc[2][0]["span_end"]) == (2, 11)


def test_duplicate_spans_short_docs_and_n_guard(spark):
    docs = _mk_docs(spark, [(1, "too short"), (2, "too short")])
    assert dedup.duplicate_ngram_spans(docs, "doc_id", "text", n=8).count() == 0
    with pytest.raises(ValueError):
        dedup.duplicate_ngram_spans(docs, "doc_id", "text", n=1)


def test_substring_dup_stats_filter(spark):
    shared = " ".join(f"w{i}" for i in range(20))
    docs = _mk_docs(
        spark,
        [
            (1, shared),                                  # 100% duplicated
            (2, shared + " unique tail here now ok yes"),  # partially duplicated
            (3, "independent document with its own words entirely"),
        ],
    )
    got = {
        r["doc_id"]: r
        for r in dedup.substring_dup_stats(
            docs, "doc_id", "text", n=8, max_dup_frac=0.5
        ).collect()
    }
    assert got[1]["dup_frac"] == 1.0 and not got[1]["keep_substring"]
    assert got[2]["dup_tokens"] == 20 and got[2]["n_tokens"] == 26
    assert got[3]["dup_frac"] == 0.0 and got[3]["keep_substring"]


# ---------------------------------------------------------------------------
# bigram LM perplexity
# ---------------------------------------------------------------------------

def test_lm_perplexity_reference_values(spark):
    rows = [(1, "a b a b"), (2, "a b c"), (3, "x")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in textstats.lm_perplexity(df, "doc_id", "text").collect()}

    # reference model: bigrams ab(x2 from doc1) ba(1) ab(doc2) bc(1) => c(a b)=3, c(b a)=1, c(b c)=1
    # contexts: c(a ·)=3, c(b ·)=2 ; V = {a,b,c,x} = 4 ; k=0.5
    def p(c12, c1):
        return (c12 + 0.5) / (c1 + 0.5 * 4)

    nll1 = -(math.log(p(3, 3)) + math.log(p(1, 2)) + math.log(p(3, 3))) / 3
    assert got[1]["avg_nll"] == pytest.approx(round(nll1, 6), abs=2e-6)
    assert got[1]["ppl"] == pytest.approx(round(math.exp(nll1), 6), abs=2e-6)
    nll2 = -(math.log(p(3, 3)) + math.log(p(1, 2))) / 2
    assert got[2]["avg_nll"] == pytest.approx(round(nll2, 6), abs=2e-6)
    # single-token doc: no bigrams
    assert got[3]["n_bigrams"] == 0 and got[3]["ppl"] is None


def test_lm_perplexity_external_reference(spark):
    ref = spark.createDataFrame([(1, "a b a b")], "doc_id long, text string")
    df = spark.createDataFrame([(9, "a b z q")], "doc_id long, text string")
    row = textstats.lm_perplexity(df, "doc_id", "text", ref_df=ref).collect()[0]
    # seen bigram (a,b): c12=2, c(a ·)=2, V=2 ; unseen (b,z): c(b ·)=1 ;
    # unseen context (z,q): c12=0, c1=0
    k, v = 0.5, 2
    exp_nll = -(
        math.log((2 + k) / (2 + k * v))
        + math.log(k / (1 + k * v))
        + math.log(k / (0 + k * v))
    ) / 3
    assert row["avg_nll"] == pytest.approx(round(exp_nll, 6), abs=2e-6)


# ---------------------------------------------------------------------------
# JSONL round-trip
# ---------------------------------------------------------------------------

def test_jsonl_roundtrip(spark, tmp_path):
    from ai_etl_pipeline_spark.sources.readers import read_jsonl
    from ai_etl_pipeline_spark.sources.writers import write_jsonl

    rows = [
        (1, 'line with "quotes" and \n newline', "en"),
        (2, "unicode: über straße 日本語", "de"),
        (3, None, "es"),  # null text survives
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(df, out)
    back = read_jsonl(spark, out, schema="doc_id long, text string, lang string")
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_jsonl_partitioned_write(spark, tmp_path):
    from ai_etl_pipeline_spark.sources.readers import read_jsonl
    from ai_etl_pipeline_spark.sources.writers import write_jsonl

    df = spark.createDataFrame(
        [(1, "a", "en"), (2, "b", "de")], "doc_id long, text string, lang string"
    )
    out = str(tmp_path / "parts")
    write_jsonl(df, out, partition_cols=["lang"])
    import os

    assert sorted(d for d in os.listdir(out) if d.startswith("lang=")) == [
        "lang=de",
        "lang=en",
    ]
    back = read_jsonl(spark, out, schema="doc_id long, text string")
    assert back.count() == 2


# ---------------------------------------------------------------------------
# zone-map file skipping
# ---------------------------------------------------------------------------

def test_zone_map_prunes_files_and_preserves_results(spark, tmp_path):
    from ai_etl_pipeline_spark.sources.readers import (
        zone_map_manifest,
        zone_map_pruned_scan,
    )

    df = spark.range(0, 1000).withColumn("v", F.col("id") * 2)
    out = str(tmp_path / "zoned")
    df.repartitionByRange(10, "id").write.parquet(out)
    man = zone_map_manifest(spark, out, ["id"])
    assert man.count() == 10 and man.agg(F.sum("n_rows")).collect()[0][0] == 1000

    pruned = zone_map_pruned_scan(spark, out, man, "id", lo=150, hi=250)
    # correctness: identical to the unpruned filter
    want = sorted(r["id"] for r in df.where(F.col("id").between(150, 250)).collect())
    got = sorted(r["id"] for r in pruned.collect())
    assert got == want
    # skipping: the 101-row slice lives in at most 3 of 10 range files
    assert 0 < len(pruned.inputFiles()) <= 3

    # empty intersection -> zero files, empty result, schema preserved
    none = zone_map_pruned_scan(spark, out, man, "id", lo=5000, hi=6000)
    assert none.count() == 0 and none.columns == ["id", "v"]


def test_zone_map_null_zones_kept(spark, tmp_path):
    from ai_etl_pipeline_spark.sources.readers import (
        zone_map_manifest,
        zone_map_pruned_scan,
    )

    a = spark.createDataFrame([(1, "x"), (2, "y")], "k long, s string")
    b = spark.createDataFrame([(None, "z")], "k long, s string")
    out = str(tmp_path / "nullzone")
    a.coalesce(1).write.parquet(out)
    b.coalesce(1).write.mode("append").parquet(out)
    man = zone_map_manifest(spark, out, ["k"])
    # the all-NULL file has NULL min/max -> conservatively kept, but the
    # re-applied predicate still filters its rows out
    got = zone_map_pruned_scan(spark, out, man, "k", lo=1, hi=10)
    assert sorted(r["k"] for r in got.collect()) == [1, 2]
    with pytest.raises(ValueError):
        zone_map_pruned_scan(spark, out, man, "k")


# ---------------------------------------------------------------------------
# mergeable HLL sketch rollup
# ---------------------------------------------------------------------------

def test_hll_rollup_merge_equals_direct(spark):
    from ai_etl_pipeline_spark.operators import distinct as dx

    rows = [(g, d, u) for g in ("a", "b") for d in range(3) for u in range(d * 7, d * 7 + 20)]
    df = spark.createDataFrame(rows, "grp string, day int, user long")
    rolled = {
        r["grp"]: r
        for r in dx.hll_sketch_rollup(df, ["grp", "day"], ["grp"], "user").collect()
    }
    # 3 fine groups per coarse group; exact distinct = |{0..33}| = 34,
    # far inside sparse mode -> estimate is exact
    for g in ("a", "b"):
        assert rolled[g]["n_fine_groups"] == 3
        assert round(rolled[g]["approx_distinct"]) == 34

    # global rollup (empty coarse keys) merges ALL sketches
    total = dx.hll_sketch_rollup(df, ["grp", "day"], [], "user").collect()[0]
    assert total["n_fine_groups"] == 6 and round(total["approx_distinct"]) == 34

    with pytest.raises(ValueError):
        dx.hll_sketch_rollup(df, ["day"], ["grp"], "user")


def test_hll_rollup_sketch_column_is_reusable(spark):
    """The binary sketch column must survive persistence and re-union —
    the whole point of the mergeable tier."""
    from ai_etl_pipeline_spark.operators import distinct as dx

    df = spark.createDataFrame(
        [(d, u) for d in range(4) for u in range(50)], "day int, user long"
    )
    daily = dx.hll_sketch_rollup(df, ["day"], ["day"], "user").select("day", "sketch")
    re_merged = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est")
    ).collect()[0]["est"]
    assert round(re_merged) == 50


# ---------------------------------------------------------------------------
# linear quality classifier + winsorize
# ---------------------------------------------------------------------------

def test_classifier_literal_equals_broadcast(spark):
    w = {"good": 2.0, "great": 1.0, "bad": -3.0}
    rows = [
        (1, "good great good"),
        (2, "bad bad stuff"),
        (3, "neutral words only"),
        (4, ""),  # empty doc must survive both renderings
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    lit_rows = sorted(
        map(
            tuple,
            textstats.linear_quality_classifier(
                df, "doc_id", "text", w, mode="literal"
            ).collect(),
        )
    )
    bc_rows = sorted(
        map(
            tuple,
            textstats.linear_quality_classifier(
                df, "doc_id", "text", w, mode="broadcast"
            ).collect(),
        )
    )
    assert lit_rows == bc_rows
    got = {r[0]: r for r in lit_rows}
    import math

    score1 = round((2.0 + 1.0 + 2.0) / 3, 6)
    assert got[1][2] == score1
    assert got[1][3] == round(1 / (1 + math.exp(-score1)), 6)
    assert got[1][4] is True and got[2][4] is False
    assert got[3][2] == 0.0 and got[3][4] is True  # sigmoid(0)=0.5 >= 0.5
    assert got[4][1] == 0 and got[4][2] == 0.0


def test_classifier_validation(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        textstats.linear_quality_classifier(df, "doc_id", "text", {})
    with pytest.raises(ValueError):
        textstats.linear_quality_classifier(df, "doc_id", "text", {"a": 1.0}, mode="x")


def test_winsorize_clips_to_exact_percentiles(spark):
    from ai_etl_pipeline_spark.operators import clean as cl

    vals = list(range(1, 101))  # 1..100
    df = spark.createDataFrame([(v, float(v)) for v in vals], "k long, v double")
    out = cl.winsorize(df, ["v"], lo=0.10, hi=0.90)
    rows = {r["k"]: r for r in out.collect()}
    # exact linear-interpolation percentiles of 1..100: p10 = 10.9, p90 = 90.1
    assert min(r["v"] for r in rows.values()) == pytest.approx(10.9)
    assert max(r["v"] for r in rows.values()) == pytest.approx(90.1)
    clipped = [k for k, r in rows.items() if r["v__was_clipped"]]
    assert sorted(clipped) == list(range(1, 11)) + list(range(91, 101))
    assert rows[50]["v"] == 50.0 and not rows[50]["v__was_clipped"]
    with pytest.raises(ValueError):
        cl.winsorize(df, [], 0.1, 0.9)
    with pytest.raises(ValueError):
        cl.winsorize(df, ["v"], 0.9, 0.1)


def test_winsorize_null_inputs_stay_null(spark):
    """NULL inputs must stay NULL (least/greatest skip NULLs, so the
    naive clip silently imputes missing values to the LOW bound) and
    must never count as clipped."""
    from ai_etl_pipeline_spark.operators import clean as cl

    rows = [(v, float(v)) for v in range(1, 101)] + [(1000, None), (1001, None)]
    df = spark.createDataFrame(rows, "k long, v double")
    for approx in (False, True):
        out = {r["k"]: r for r in cl.winsorize(df, ["v"], 0.10, 0.90, approx=approx).collect()}
        assert out[1000]["v"] is None and out[1001]["v"] is None
        assert out[1000]["v__was_clipped"] is False
        assert out[1001]["v__was_clipped"] is False
        # non-null rows still clip (bounds computed over non-null values)
        assert out[1]["v__was_clipped"] is True
        assert out[50]["v__was_clipped"] is False


def test_winsorize_approx_matches_exact_on_small_input(spark):
    """GK sketch at accuracy >> n is exact up to interpolation: on
    1..100 the approx bounds are actual elements within one rank of the
    exact interpolated percentiles, and the exact path is unchanged."""
    from ai_etl_pipeline_spark.operators import clean as cl

    df = spark.createDataFrame(
        [(v, float(v)) for v in range(1, 101)], "k long, v double"
    )
    exact = {r["k"]: r["v"] for r in cl.winsorize(df, ["v"], 0.10, 0.90).collect()}
    approx = {
        r["k"]: r["v"]
        for r in cl.winsorize(df, ["v"], 0.10, 0.90, approx=True).collect()
    }
    # exact path: interpolated bounds (regression guard for approx knob)
    assert min(exact.values()) == pytest.approx(10.9)
    assert max(exact.values()) == pytest.approx(90.1)
    # approx path: bounds within 1 rank of the exact ones
    assert abs(min(approx.values()) - 10.9) <= 1.0
    assert abs(max(approx.values()) - 90.1) <= 1.0
    assert approx[50] == 50.0


def test_quantile_threshold_filter_approx(spark, documents):
    from ai_etl_pipeline_spark.operators import textstats as ts

    exact = ts.quantile_threshold_filter(documents, "n_chars", 0.5, keep="above")
    approx = ts.quantile_threshold_filter(
        documents, "n_chars", 0.5, keep="above", approx=True
    )
    ne, na = exact.count(), approx.count()
    assert ne > 0 and na > 0
    # kept sets agree up to boundary rows (sketch exact at this n, but
    # returns an element rather than an interpolated value)
    assert abs(ne - na) <= max(5, int(0.05 * ne))


# ---------------------------------------------------------------------------
# feature hashing
# ---------------------------------------------------------------------------

def test_feature_hash_vectors_properties(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, ""), (3, "gamma")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["vector"]
        for r in similarity.feature_hash_vectors(
            df, "doc_id", "text", dim=8
        ).collect()
    }
    # unit norm for non-empty docs
    n1 = sum(v * v for v in out[1]) ** 0.5
    assert n1 == pytest.approx(1.0, abs=1e-4)
    # empty doc -> zero vector, not a dropped row
    assert out[2] == [0.0] * 8
    # single-token doc: exactly one nonzero bucket at +-1
    nz = [v for v in out[3] if v != 0.0]
    assert len(nz) == 1 and abs(nz[0]) == pytest.approx(1.0)
    # determinism across runs
    again = {
        r["doc_id"]: r["vector"]
        for r in similarity.feature_hash_vectors(df, "doc_id", "text", dim=8).collect()
    }
    assert again == out
    with pytest.raises(ValueError):
        similarity.feature_hash_vectors(df, "doc_id", "text", dim=1)


def test_feature_hash_feeds_kmeans(spark, documents):
    """The vectorizer's output must be consumable by the existing
    k-means tier (array<double> contract)."""
    vecs = similarity.feature_hash_vectors(
        documents.where(F.col("doc_id") < 60), "doc_id", "text", dim=16
    ).withColumnRenamed("vector", "embedding")
    assigned = similarity.kmeans_lloyd(
        vecs, "doc_id", "embedding", k=4, iterations=3
    )
    assert assigned.count() == 60
    assert assigned.select("cluster").distinct().count() <= 4


# ---------------------------------------------------------------------------
# correlation matrix + schema evolution
# ---------------------------------------------------------------------------

def test_correlation_matrix_known_values(spark):
    from ai_etl_pipeline_spark.operators import distinct as dx

    rows = [(float(i), 2.0 * i, float(-i), 5.0) for i in range(1, 21)]
    df = spark.createDataFrame(rows, "a double, b double, c double, d double")
    got = {(r["col_x"], r["col_y"]): r["corr"] for r in dx.correlation_matrix(
        df, ["a", "b", "c", "d"]
    ).collect()}
    assert got[("a", "b")] == 1.0       # perfectly linear
    assert got[("a", "c")] == -1.0      # anti-correlated
    assert got[("a", "d")] is None      # zero-variance column -> NULL
    assert len(got) == 6                # 4 choose 2
    with pytest.raises(ValueError):
        dx.correlation_matrix(df, ["a"])


def test_schema_evolution_reader(spark, tmp_path):
    from ai_etl_pipeline_spark.sources.readers import read_parquet_evolved

    out = str(tmp_path / "evolved")
    spark.createDataFrame([(1, "x")], "id long, a string").write.parquet(out)
    spark.createDataFrame(
        [(2, "y", 9.0)], "id long, a string, b double"
    ).write.mode("append").parquet(out)
    got = {r["id"]: r for r in read_parquet_evolved(spark, out).collect()}
    assert set(got[1].asDict()) == {"id", "a", "b"}
    assert got[1]["b"] is None and got[2]["b"] == 9.0


# ---------------------------------------------------------------------------
# round-6 wave 6: source-level quality gate, OOV rate, PQ re-rank
# ---------------------------------------------------------------------------

def test_source_quality_filter_keeps_high_avg_sources(spark):
    rows = (
        [(i, "good", 0.9) for i in range(10)]
        + [(100 + i, "bad", 0.2) for i in range(10)]
        + [(200, "tiny", 1.0)]  # above threshold but below min_docs
    )
    df = spark.createDataFrame(rows, "doc_id long, source string, q double")
    kept = textstats.source_quality_filter(
        df, "source", "q", min_avg=0.5, min_docs=2
    )
    out = kept.collect()
    assert {r["source"] for r in out} == {"good"}
    assert len(out) == 10
    assert all(r["src_avg_metric"] == 0.9 and r["src_docs"] == 10 for r in out)
    # keep=False inverts the gate: failing sources (low avg OR low support)
    dropped = textstats.source_quality_filter(
        df, "source", "q", min_avg=0.5, min_docs=2, keep=False
    )
    assert {r["source"] for r in dropped.collect()} == {"bad", "tiny"}


def test_oov_rate_hand_computed(spark):
    df = spark.createDataFrame(
        [
            (1, "a a a b"),      # a:3 b:1
            (2, "a b c"),        # c rare
            (3, "   "),          # token-less
        ],
        "doc_id long, text string",
    )
    # vocab_size=2 -> vocab {a, b} (a:4, b:2, c:1)
    out = {r["doc_id"]: r for r in textstats.oov_rate(df, "doc_id", "text", 2).collect()}
    assert out[1]["n_tok"] == 4 and out[1]["n_oov"] == 0 and out[1]["oov_rate"] == 0.0
    assert out[2]["n_tok"] == 3 and out[2]["n_oov"] == 1
    assert out[2]["oov_rate"] == round(1 / 3, 6)
    assert out[3]["n_tok"] == 0 and out[3]["n_oov"] == 0 and out[3]["oov_rate"] == 0.0


def test_oov_rate_vocab_tie_is_deterministic(spark):
    # b and c tie on frequency; token-asc tiebreak puts b in, c out
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a c b c")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in textstats.oov_rate(df, "doc_id", "text", 2).collect()}
    # vocab {a:3, b:2} (c:2 loses the tie) -> doc 2 has 2 oov of 4
    assert out[2]["n_oov"] == 2 and out[2]["oov_rate"] == 0.5
    with pytest.raises(ValueError):
        textstats.oov_rate(df, "doc_id", "text", 0)


def test_pq_rerank_scores_are_exact_and_guarded(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 3)
    rer = similarity.pq_rerank_knn(emb, queries, k=3, candidates=8).collect()
    assert len(rer) == 9
    # re-ranked scores must equal the EXACT cosine (tier 2 rescored
    # against float vectors, not the PQ reconstruction)
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in similarity.brute_force_knn(emb, queries, k=10_000).collect()
    }
    for r in rer:
        assert exact[(r["query_id"], r["neighbor_id"])] == r["cosine"]
    with pytest.raises(ValueError):
        similarity.pq_rerank_knn(emb, queries, k=5, candidates=3)


def test_pq_rerank_full_candidates_equals_bruteforce(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").where(
        F.col("vec_id") < 40
    )
    queries = emb.where(F.col("vec_id") < 2)
    # candidate tier spans the whole corpus -> recall 1 by construction
    rer = similarity.pq_rerank_knn(emb, queries, k=5, candidates=39)
    bf = similarity.brute_force_knn(emb, queries, k=5)
    assert sorted(map(tuple, rer.collect())) == sorted(map(tuple, bf.collect()))
