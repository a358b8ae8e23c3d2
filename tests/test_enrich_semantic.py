"""Enrichment (T3/T5), semantic providers (T1/T2/M1/M2), mapping split
(P9/P10) — SURVEY.md §2.8."""

from ai_etl_pipeline_spark.operators import distinct, enrich, mapping
from ai_etl_pipeline_spark.semantic.providers import (
    ENGLISH,
    NON_ENGLISH,
    NON_TEXT,
    TEXT,
    HeuristicProvider,
    ThrottledBatchTranslator,
    classify_text_columns,
    detect_column_languages,
)


def test_value_map_literal_and_broadcast_agree(spark):
    df = spark.createDataFrame([(i, f"v{i}") for i in range(300)], "id long, v string")
    small = {"v0": "zero", "v1": "one"}
    big = {f"v{i}": f"t{i}" for i in range(200)}  # > LITERAL_MAP_MAX -> join path
    out_small = enrich.apply_value_map(df, "v", small)
    out_big = enrich.apply_value_map(df, "v", big, spark=spark)
    assert out_small.count() == 300  # row count preserved exactly
    assert out_big.count() == 300
    got = {r["id"]: r["v"] for r in out_small.collect()}
    assert got[0] == "zero" and got[2] == "v2"  # identity fallback
    got_big = {r["id"]: r["v"] for r in out_big.collect()}
    assert got_big[5] == "t5" and got_big[250] == "v250"


def test_value_map_missing_column_skipped(spark):
    df = spark.createDataFrame([(1,)], "id long")
    assert enrich.apply_value_map(df, "nope", {"a": "b"}) is df  # translate.py:223-224 guard


def test_translate_distinct_semi_join_reduction(spark):
    # 1000 rows but only 3 distinct values -> provider sees each value once
    df = spark.createDataFrame([(i, f"w{i % 3}") for i in range(1000)], "id long, v string")
    seen = []

    def fake_translate(batch):
        seen.extend(batch)
        return [b.upper() for b in batch]

    maps = enrich.translate_distinct_values(df, ["v"], fake_translate)
    assert sorted(seen) == ["w0", "w1", "w2"]  # distinct-only, the reference's key idiom
    assert maps["v"]["w1"] == "W1"


def test_translate_identity_fallback_on_failure(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")

    def broken(batch):
        raise RuntimeError("api down")

    maps = enrich.translate_distinct_values(df, ["v"], broken)
    assert maps["v"] == {"a": "a", "b": "b"}  # translate.py:111-116


def test_throttled_batch_translator_batches():
    calls = []
    t = ThrottledBatchTranslator(call=lambda b: (calls.append(len(b)), b)[1], batch_size=10, throttle_s=0.0)
    out = t.translate_batch([str(i) for i in range(25)])
    assert calls == [10, 10, 5] and len(out) == 25


def test_heuristic_classifier_and_detector():
    p = HeuristicProvider()
    samples = {
        "merchant": ["Jet Tankstelle Würzburg", "Parkplatz am Bahnhof Hbf", "REWE Markt GmbH"],
        "mileagecode": ["M01", "M02", "X9"],
    }
    labels = classify_text_columns(samples, p)
    assert labels["merchant"] == TEXT
    assert labels["mileagecode"] == NON_TEXT  # codes classify NON-TEXT (FIXTURES.md)
    langs = detect_column_languages(
        {"german": ["Würzburg Straße über", "Bahnhof für möglich"],
         "english": ["the quick brown fox and the dog", "a tale of two cities"]},
        p,
    )
    assert langs["german"] == NON_ENGLISH
    assert langs["english"] == ENGLISH


def test_mapping_cleanup_m2():
    raw = {
        "1. **merchant**": "DIM_Company.company_name",
        "trip_name": "Unclear (needs review)",
        "amount": "FACT_EmissionActivityData.amount (numeric value)",
    }
    cleaned = mapping.clean_column_mapping(raw)
    assert cleaned == {
        "merchant": {"table": "DIM_Company", "column": "company_name"},
        "amount": {"table": "FACT_EmissionActivityData", "column": "amount"},
    }  # mapper.py:86 key strip, :92-93 unclear drop, :96 parenthetical strip


def test_split_tables_p9(spark):
    df = spark.createDataFrame([(1, "a", 2.0)], "k long, name string, amt double")
    tables = mapping.split_into_tables(
        df,
        {
            "k": {"table": "FACT", "column": "id"},
            "amt": {"table": "FACT", "column": "amount"},
            "name": {"table": "DIM", "column": "label"},
            "missing_col": {"table": "DIM", "column": "x"},  # guard: skipped
        },
    )
    assert sorted(tables) == ["DIM", "FACT"]
    assert tables["FACT"].columns == ["id", "amount"]
    assert tables["DIM"].columns == ["label"]


def test_m1_heuristic_schema_mapping(spark):
    p = HeuristicProvider()
    structure = {"DIM_Company": ["company_id", "company_name"], "DIM_Unit": ["unit_id", "unit_name"]}
    samples = {"company_name": ["ACME"], "unit": ["kWh"], "zzz_opaque": ["?"]}
    raw = p.map_schema("desc", structure, samples)
    assert raw["company_name"] == "DIM_Company.company_name"
    assert raw["unit"].startswith("DIM_Unit.")
    cleaned = mapping.clean_column_mapping(raw)
    assert "zzz_opaque" not in cleaned  # Unclear -> dropped by M2


def test_m1_mapping_injective_per_destination(spark):
    # Round-2 driver crash repro: every orders key-ish column scores >=0.5
    # against FACT_Orders.o_orderkey; without the injectivity rule the
    # split frame repeats o_orderkey 4x and the driver's canonicalizer
    # dies on duplicate labels. The highest-scoring source must win and
    # the losers must land on 'Unclear'.
    p = HeuristicProvider()
    structure = {"FACT_Orders": ["o_orderkey", "o_totalprice", "o_orderdate"]}
    samples = {
        c: ["x"]
        for c in [
            "o_orderkey", "o_custkey", "o_orderstatus",
            "o_totalprice", "o_orderdate", "o_orderpriority",
        ]
    }
    raw = p.map_schema("orders fact", structure, samples)
    assert raw["o_orderkey"] == "FACT_Orders.o_orderkey"
    assert raw["o_totalprice"] == "FACT_Orders.o_totalprice"
    assert raw["o_orderdate"] == "FACT_Orders.o_orderdate"
    for loser in ["o_custkey", "o_orderstatus", "o_orderpriority"]:
        assert raw[loser] == "Unclear (needs review)"
    targets = [v for v in raw.values() if not v.startswith("Unclear")]
    assert len(targets) == len(set(targets))  # injective


def test_split_tables_keeps_first_on_duplicate_destination(spark):
    # Defense in depth behind the injective mapper: even a hand-written
    # mapping routing two sources to one destination column must not emit
    # a duplicate-named schema (mirrors P4, reference preprocess.py:54-57).
    df = spark.createDataFrame([(1, 2, 3.0)], "a long, b long, c double")
    tables = mapping.split_into_tables(
        df,
        {
            "a": {"table": "FACT", "column": "k"},
            "b": {"table": "FACT", "column": "k"},  # duplicate dest -> dropped
            "c": {"table": "FACT", "column": "amt"},
        },
    )
    assert tables["FACT"].columns == ["k", "amt"]
    assert tables["FACT"].collect()[0] == (1, 3.0)  # keep-first: src 'a'


def test_distinct_profiles_single_pass(documents):
    prof = distinct.column_profiles(documents, approx=False)
    assert prof["lang"]["distinct"] == 5
    assert prof["doc_id"]["non_null"] == prof["doc_id"]["total"]
    nulls = distinct.null_counts(documents)
    assert nulls["doc_id"] == 0
    samples = distinct.column_value_samples(documents, "lang", 3)
    assert len(samples) == 3
