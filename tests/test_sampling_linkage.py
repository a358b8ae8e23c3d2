"""Round-6 samplers (weighted A-ES, group holdout split, token budget)
and entity resolution."""

import math

import pytest
from pyspark.sql import functions as F

from ai_etl_pipeline_spark.functions.portable import md5_i64_py
from ai_etl_pipeline_spark.operators import dedup, linkage, sampling


def test_weighted_hash_sample_selects_topk_by_aes_key(spark):
    df = spark.createDataFrame(
        [(i, float(i % 5 + 1)) for i in range(50)], "id long, w double"
    )
    out = sampling.weighted_hash_sample(df, "id", "w", k=10).collect()
    assert len(out) == 10
    # replicate the key driver-side and confirm the exact same top-10
    def key(i, w):
        u = (md5_i64_py(f"wsample|{i}") % 1_000_000 + 1.0) / 1_000_001.0
        return round(u ** (1.0 / w), 12)

    expected = sorted(
        ((key(i, float(i % 5 + 1)), -i) for i in range(50)), reverse=True
    )[:10]
    got = sorted(((r["sample_key"], -r["id"]) for r in out), reverse=True)
    assert [(-b) for _, b in got] == [(-b) for _, b in expected]


def test_weighted_hash_sample_skips_nonpositive_weights(spark):
    df = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, None), (4, 2.0)], "id long, w double"
    )
    out = sampling.weighted_hash_sample(df, "id", "w", k=10).collect()
    assert [r["id"] for r in out] == [4]
    with pytest.raises(ValueError):
        sampling.weighted_hash_sample(df, "id", "w", k=0)


def test_weighted_sample_is_weight_proportional(spark):
    # two strata with 10x weight difference: the heavy stratum must
    # dominate the sample (statistical but deterministic: fixed hashes)
    df = spark.createDataFrame(
        [(i, 10.0 if i < 500 else 1.0) for i in range(1000)], "id long, w double"
    )
    out = sampling.weighted_hash_sample(df, "id", "w", k=100).collect()
    heavy = sum(1 for r in out if r["id"] < 500)
    assert heavy > 70  # E[heavy] ~ 90; fixed-hash draw, no flakiness


def test_group_holdout_split_is_group_pure_and_exhaustive(spark):
    df = spark.createDataFrame(
        [(i, f"src{i % 13}") for i in range(400)], "id long, g string"
    )
    out = sampling.group_holdout_split(
        df, "g", {"train": 0.6, "val": 0.2, "test": 0.2}
    )
    rows = out.collect()
    assert all(r["split"] in ("train", "val", "test") for r in rows)
    by_group = {}
    for r in rows:
        by_group.setdefault(r["g"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_group.values())  # leakage-safe
    with pytest.raises(ValueError):
        sampling.group_holdout_split(df, "g", {"train": 0.5, "val": 0.2})


def test_token_budget_sample_respects_budget_per_stratum(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b", 10 + i % 7) for i in range(100)],
        "id long, s string, toks int",
    )
    out = sampling.token_budget_sample(df, "id", "toks", budget=60, strata_col="s")
    rows = out.collect()
    per = {}
    for r in rows:
        per[r["s"]] = per.get(r["s"], 0) + r["toks"]
    assert all(v <= 60 for v in per.values())
    # greedy: the largest doc per stratum is always in (toks max = 16 <= 60)
    for s in ("a", "b"):
        max_tok = max(r["toks"] for r in df.where(F.col("s") == s).collect())
        assert any(r["s"] == s and r["toks"] == max_tok for r in rows)
    with pytest.raises(ValueError):
        sampling.token_budget_sample(df, "id", "toks", budget=0)


def test_token_budget_sample_matches_window_semantics(spark):
    df = spark.createDataFrame(
        [(1, 30), (2, 30), (3, 30), (4, 5)], "id long, toks int"
    )
    out = sampling.token_budget_sample(df, "id", "toks", budget=65)
    # order: toks desc, id -> 1(30),2(60),3(90: out),4(95: out)
    assert sorted(r["id"] for r in out.collect()) == [1, 2]


def test_blocked_candidate_pairs_respects_blocks(spark):
    df = spark.createDataFrame(
        [(1, "aa", "x"), (2, "ab", "x"), (3, "aa", "y")], "id long, name string, blk string"
    )
    pairs = linkage.blocked_candidate_pairs(df, "id", ["name"], [F.col("blk")])
    got = sorted((r["id_a"], r["id_b"]) for r in pairs.collect())
    assert got == [(1, 2)]  # 3 is in another block; each pair once


def test_entity_resolution_chains_transitively(spark):
    # aaa ~ aab ~ abb (distance 1 chain); zzz is a singleton
    df = spark.createDataFrame(
        [(1, "aaa"), (2, "aab"), (3, "abb"), (4, "zzz")], "id long, name string"
    )
    out = linkage.entity_resolution(
        df, "id", "name", [F.length("name")], max_distance=1
    )
    rows = {r["id"]: (r["entity_id"], r["entity_size"]) for r in out.collect()}
    assert rows[1] == (1, 3) and rows[2] == (1, 3) and rows[3] == (1, 3)
    assert rows[4] == (4, 1)
    with pytest.raises(ValueError):
        linkage.entity_resolution(df, "id", "name", [F.length("name")], max_distance=-1)
