"""Salted join, pivot, pandas-UDF surface."""

from pyspark.sql import functions as F

from ai_etl_pipeline_spark.operators import relational
from ai_etl_pipeline_spark.functions.pandas_udfs import grouped_zscore, normalize_text_udf


def test_salted_join_equals_plain_join(spark):
    left = spark.createDataFrame(
        [(1, i) for i in range(100)] + [(2, 0)], "k long, v long"  # key 1 is hot
    )
    right = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, lab string")
    plain = left.join(right, "k").groupBy("lab").count()
    salted = relational.salted_join(left, right, "k").groupBy("lab").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer(spark):
    left = spark.createDataFrame([(1,), (9,)], "k long")
    right = spark.createDataFrame([(1, "a")], "k long, lab string")
    out = relational.salted_join(left, right, "k", how="left")
    got = {r["k"]: r["lab"] for r in out.collect()}
    assert got == {1: "a", 9: None}


def test_pivot_explicit_values(spark):
    df = spark.createDataFrame([("g1", "x"), ("g1", "x"), ("g2", "y")], "g string, p string")
    out = relational.pivot_agg(df, "g", "p", ["x", "y", "z"], F.count(F.lit(1)), fill=0)
    rows = {r["g"]: r for r in out.collect()}
    assert rows["g1"]["x"] == 2 and rows["g1"]["y"] == 0 and rows["g2"]["z"] == 0


def test_scalar_pandas_udf(spark):
    df = spark.createDataFrame([("  Hello   WORLD  ",)], "s string")
    out = df.select(normalize_text_udf("s").alias("n")).first()
    assert out["n"] == "hello world"


def test_applyinpandas_zscore(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 10.0)], "g string, v double"
    )
    out = {(r["g"], r["v"]): r["zscore"] for r in grouped_zscore(df, "g", "v").collect()}
    assert abs(out[("a", 3.0)] - 0.7071) < 1e-3
    assert out[("b", 10.0)] == 0.0  # single-row group -> no std


def test_approx_aggregates_accuracy(spark, sf_dir):
    # HLL++ count-distinct within 5% of exact; approx median between the
    # exact 40th and 60th percentiles (GK with accuracy=10000 is much
    # tighter; these are safe bounds, not the guarantee)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    got = li.agg(
        F.approx_count_distinct("l_partkey").alias("apx"),
        F.countDistinct("l_partkey").alias("exact"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("amed"),
        F.expr("percentile(l_extendedprice, 0.4)").alias("p40"),
        F.expr("percentile(l_extendedprice, 0.6)").alias("p60"),
    ).first()
    assert abs(got["apx"] - got["exact"]) <= 0.05 * got["exact"]
    assert got["p40"] <= got["amed"] <= got["p60"]


def test_cogrouped_ratio(spark):
    from ai_etl_pipeline_spark.functions.pandas_udfs import cogrouped_ratio

    left = spark.createDataFrame([(1,), (1,), (2,)], "k long")
    right = spark.createDataFrame([(1,), (3,)], "k long")
    got = {r["key"]: r for r in cogrouped_ratio(left, right, "k").collect()}
    assert got[1]["n_left"] == 2 and got[1]["n_right"] == 1 and got[1]["ratio"] == 2.0
    assert got[2]["n_right"] == 0 and got[2]["ratio"] is None  # right-empty group
    assert got[3]["n_left"] == 0                               # left-empty group


def test_asof_join_backward_forward_tolerance(spark):
    from pyspark.sql import functions as F

    from ai_etl_pipeline_spark.operators import relational as rel

    left = spark.createDataFrame(
        [(1, "u", 10), (2, "u", 20), (3, "u", 31), (4, "v", 5)],
        "event_id long, user string, ts long",
    )
    right = spark.createDataFrame(
        [("u", 10, 1.0), ("u", 25, 2.5), ("w", 1, 9.9)],
        "user string, ts long, px double",
    )
    back = {
        r["event_id"]: (r["__asof_ts"], r["px"])
        for r in rel.asof_join(left, right, on="user", right_cols=["px"]).collect()
    }
    assert back[1] == (10, 1.0)   # tie: equal ts matches (merge_asof default)
    assert back[2] == (10, 1.0)
    assert back[3] == (25, 2.5)
    assert back[4] == (None, None)  # no right rows for key v
    fwd = {
        r["event_id"]: (r["__asof_ts"], r["px"])
        for r in rel.asof_join(
            left, right, on="user", right_cols=["px"], direction="forward"
        ).collect()
    }
    assert fwd[2] == (25, 2.5)    # next right at/after 20
    assert fwd[3] == (None, None)  # nothing after 31
    tol = {
        r["event_id"]: r["px"]
        for r in rel.asof_join(
            left, right, on="user", right_cols=["px"],
            tolerance_expr=F.col("__t") - F.col("__asof_ts") <= F.lit(5),
        ).collect()
    }
    assert tol[1] == 1.0 and tol[3] is None  # 31-25=6 exceeds tolerance 5
    assert tol[2] is None                    # 20-10=10 exceeds tolerance


def test_bloom_prune_join_semi_equals_plain_semi(spark):
    fact = spark.createDataFrame([(i, i % 7) for i in range(500)], "id long, k long")
    dim = spark.createDataFrame([(0,), (3,), (99,)], "k long")
    plain = fact.join(dim, "k", "left_semi")
    bloom = relational.bloom_prune_join(fact, dim, "k", m_bits=4096, num_hashes=3)
    assert sorted(r["id"] for r in bloom.collect()) == sorted(
        r["id"] for r in plain.collect()
    )


def test_bloom_prune_join_inner_and_anti(spark):
    fact = spark.createDataFrame([(i, i % 10) for i in range(200)], "id long, k long")
    dim = spark.createDataFrame([(2, "x"), (5, "y")], "k long, lab string")
    inner = relational.bloom_prune_join(fact, dim, "k", how="inner", m_bits=1024)
    plain_inner = fact.join(dim, "k", "inner")
    assert sorted(map(tuple, inner.select("id", "lab").collect())) == sorted(
        map(tuple, plain_inner.select("id", "lab").collect())
    )
    anti = relational.bloom_prune_join(fact, dim.select("k"), "k", how="left_anti", m_bits=1024)
    plain_anti = fact.join(dim.select("k"), "k", "left_anti")
    assert sorted(r["id"] for r in anti.collect()) == sorted(
        r["id"] for r in plain_anti.collect()
    )


def test_bloom_prune_join_empty_dim_and_fp_prune(spark):
    fact = spark.createDataFrame([(i, i) for i in range(100)], "id long, k long")
    empty = spark.createDataFrame([], "k long")
    assert relational.bloom_prune_join(fact, empty, "k", m_bits=256).count() == 0
    # disjoint keysets: the bloom must prune (nearly) everything BEFORE
    # the exact join — measured via the filter's selectivity, with a
    # small filter so some false positives are plausible but bounded
    dim = spark.createDataFrame([(i,) for i in range(1000, 1010)], "k long")
    bloom = relational.bloom_filter_build(dim, "k", m_bits=1024, num_hashes=4)
    pos = [
        F.pmod(F.xxhash64(F.lit(j), F.col("k")), F.lit(1024)).alias(f"__bfp{j}")
        for j in range(4)
    ]
    tagged = fact.crossJoin(F.broadcast(bloom)).select("id", "k", *pos)
    survivors = tagged.where(
        F.expr(relational._bloom_member_expr([f"__bfp{j}" for j in range(4)]))
    ).count()
    # k=4, m=1024, n=10 keys -> fp rate ~ (1-e^(-40/1024))^4 ~ 2e-6;
    # allow a generous bound
    assert survivors <= 5


def test_bloom_filter_build_validates(spark):
    dim = spark.createDataFrame([(1,)], "k long")
    import pytest

    with pytest.raises(ValueError):
        relational.bloom_filter_build(dim, "k", m_bits=100)
    with pytest.raises(ValueError):
        relational.bloom_filter_build(dim, "k", num_hashes=0)
    with pytest.raises(ValueError):
        relational.bloom_prune_join(dim, dim, "k", how="full")
